"""Context-window sequence packing (operators/packing.py).

Hand-computable planted layout, structural invariants on the real
documents fixture, and a full DuckDB replay of the pipeline (running
sum + generate_series) — the oracle a round-12 catalog registration
would carry, pinned here first.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.functions import text as T
from sportstv_streaming_data_warehouse_spark.operators.packing import (
    pack_context_windows,
    pack_manifest,
)

SF001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted(spark):
    # token counts 4,3,5,12,6,3 against budget 10: doc 2 straddles the
    # seq0/seq1 boundary, doc 3 straddles seq1/seq2, doc 5 leaves the
    # final sequence at fill 0.3
    rows = [(i, n) for i, n in enumerate([4, 3, 5, 12, 6, 3])]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_planted_spans_are_exactly_the_hand_layout(spark, planted):
    got = {
        (r["doc_id"], r["seq_id"]): (
            r["doc_offset"],
            r["seq_offset"],
            r["span_tokens"],
            r["is_split"],
        )
        for r in pack_context_windows(planted, "doc_id", "n_tokens", 10).collect()
    }
    want = {
        (0, 0): (0, 0, 4, False),
        (1, 0): (0, 4, 3, False),
        (2, 0): (0, 7, 3, True),
        (2, 1): (3, 0, 2, True),
        (3, 1): (0, 2, 8, True),
        (3, 2): (8, 0, 4, True),
        (4, 2): (0, 4, 6, False),
        (5, 3): (0, 0, 3, False),
    }
    assert got == want


def test_planted_manifest(spark, planted):
    spans = pack_context_windows(planted, "doc_id", "n_tokens", 10)
    m = {r["seq_id"]: r for r in pack_manifest(spans, 10).collect()}
    assert {k: (v["n_docs"], v["n_split_docs"], v["n_tokens"]) for k, v in m.items()} == {
        0: (3, 1, 10),
        1: (2, 2, 10),
        2: (2, 1, 10),
        3: (1, 0, 3),
    }
    assert m[0]["fill_ratio"] == 1.0
    assert m[3]["fill_ratio"] == pytest.approx(0.3)


def test_zero_and_null_token_docs_are_excluded(spark):
    df = spark.createDataFrame(
        [(0, 5), (1, 0), (2, None), (3, 7)], "doc_id long, n_tokens long"
    )
    spans = pack_context_windows(df, "doc_id", "n_tokens", 100)
    assert sorted(r["doc_id"] for r in spans.collect()) == [0, 3]


def test_doc_longer_than_budget_spans_every_intermediate_sequence(spark):
    df = spark.createDataFrame([(0, 25)], "doc_id long, n_tokens long")
    spans = pack_context_windows(df, "doc_id", "n_tokens", 10).orderBy("seq_id")
    rows = spans.collect()
    assert [(r["seq_id"], r["span_tokens"], r["is_split"]) for r in rows] == [
        (0, 10, True),
        (1, 10, True),
        (2, 5, True),
    ]
    # spans are contiguous within the doc
    assert [(r["doc_offset"]) for r in rows] == [0, 10, 20]


@pytest.fixture(scope="module")
def corpus_spans(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    t = docs.select("doc_id", T.token_count(F.col("text")).alias("n_tokens"))
    return t, pack_context_windows(t, "doc_id", "n_tokens", 512).persist()


def test_corpus_invariants(spark, corpus_spans):
    t, spans = corpus_spans
    # per-document spans sum to the doc's token count and are contiguous
    per_doc = (
        spans.groupBy("doc_id")
        .agg(
            F.sum("span_tokens").alias("s"),
            F.first("n_tokens").alias("n"),
            F.min("doc_offset").alias("lo"),
            F.max(F.col("doc_offset") + F.col("span_tokens")).alias("hi"),
            F.count("*").alias("k"),
            (F.max("seq_id") - F.min("seq_id") + 1).alias("span_seqs"),
        )
        .filter(
            (F.col("s") != F.col("n"))
            | (F.col("lo") != 0)
            | (F.col("hi") != F.col("n"))
            | (F.col("k") != F.col("span_seqs"))
        )
    )
    assert per_doc.count() == 0
    # every doc with positive tokens appears
    assert spans.select("doc_id").distinct().count() == t.filter(
        F.col("n_tokens") > 0
    ).count()


def test_corpus_manifest_full_sequences_hold_exactly_budget(spark, corpus_spans):
    _, spans = corpus_spans
    m = pack_manifest(spans, 512)
    last = m.agg(F.max("seq_id")).collect()[0][0]
    bad = m.filter((F.col("seq_id") != last) & (F.col("n_tokens") != 512))
    assert bad.count() == 0
    # sequence ids are dense from 0
    assert m.count() == last + 1


def test_duckdb_replay_matches_bit_for_bit(spark, corpus_spans):
    _, spans = corpus_spans
    got = sorted(
        (
            r["doc_id"],
            r["n_tokens"],
            r["seq_id"],
            r["doc_offset"],
            r["seq_offset"],
            r["span_tokens"],
            r["is_split"],
        )
        for r in spans.collect()
    )
    ntok = r"len(list_filter(regexp_split_to_array(text, '\s+'), t -> t != ''))"
    sql = f"""
    WITH t AS (
      SELECT doc_id, {ntok} AS n_tokens
      FROM read_parquet('{SF001}/documents.parquet')
    ),
    p AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
      FROM t WHERE n_tokens > 0
    ),
    spans AS (
      SELECT doc_id, n_tokens, s // 512 + q.i AS seq_id,
             GREATEST(s, (s // 512 + q.i) * 512) - s AS doc_offset,
             GREATEST(s, (s // 512 + q.i) * 512)
               - (s // 512 + q.i) * 512 AS seq_offset,
             LEAST(s + n_tokens, (s // 512 + q.i + 1) * 512)
               - GREATEST(s, (s // 512 + q.i) * 512) AS span_tokens
      FROM p, (SELECT CAST(generate_series AS BIGINT) AS i
               FROM generate_series(0, 10000)) q
      WHERE s // 512 + q.i <= (s + n_tokens - 1) // 512
    )
    SELECT doc_id, n_tokens, seq_id, doc_offset, seq_offset, span_tokens,
           span_tokens < n_tokens AS is_split
    FROM spans
    """
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


def test_plan_has_no_single_partition_window(spark, corpus_spans):
    # the prefix sum must stay two-phase: every Window node partitions
    # by the range bucket, never SinglePartition (the 100 TB property)
    _, spans = corpus_spans
    plan = spans._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    saw_window = False
    for i, line in enumerate(lines):
        if "Window" in line and "windowspecdefinition" in line.lower():
            saw_window = True
            ctx = "\n".join(lines[i : i + 6])
            assert "SinglePartition" not in ctx, ctx
    assert saw_window


def test_layout_is_exact_past_2_53_cumulative_tokens(spark):
    """round-11 ADVICE: seq_id bounds must use integer `div`, not
    floor(long / long) — `/` is DOUBLE division, and past 2^53 cumulative
    tokens a start of 8193*2^40 - 1 rounds UP to the 8193*2^40 boundary,
    silently dropping the 1-token span in sequence 8192."""
    b = 2**40
    rows = [(i, b) for i in range(8192)]  # cumulative hits exactly 2^53
    rows.append((8192, b - 1))  # next start: 8193*2^40 - 1, unrepresentable
    rows.append((8193, 5))  # straddles the 8193*2^40 boundary
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = sorted(
        (r["seq_id"], r["doc_offset"], r["seq_offset"], r["span_tokens"])
        for r in pack_context_windows(df, "doc_id", "n_tokens", b)
        .filter(F.col("doc_id") == 8193)
        .collect()
    )
    assert got == [(8192, 0, b - 1, 1), (8193, 1, 0, 4)]


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.one_of(st.integers(min_value=0, max_value=40), st.none()),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=12),
)
def test_spans_match_a_python_reference_packer(spark, token_counts, budget):
    """pack_context_windows == the sequential concatenate-and-cut loop a
    single-process dataloader would run, for any token counts (incl.
    zero/NULL docs) and any budget."""
    rows = [(i, n) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = sorted(
        (r["doc_id"], r["seq_id"], r["doc_offset"], r["seq_offset"],
         r["span_tokens"], r["is_split"])
        for r in pack_context_windows(df, "doc_id", "n_tokens", budget).collect()
    )
    want, cursor = [], 0
    for i, n in rows:
        if n is None or n <= 0:
            continue
        done = 0
        while done < n:
            seq, off = divmod(cursor, budget)
            take = min(budget - off, n - done)
            want.append((i, seq, done, off, take, n > take))
            done += take
            cursor += take
    assert got == sorted(want)


def test_fixture_tokens_stay_far_below_the_oracle_span_cap(spark):
    """The x_pack_context DuckDB oracle enumerates at most 10,001 spans
    per document (generate_series bound); the Spark side is unbounded.
    Pin the fixture headroom so a fixture regeneration with multi-
    million-token docs fails HERE instead of as a silent driver-gate
    hash mismatch."""
    import duckdb

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        (mx,) = duckdb.sql(
            "SELECT max(len(list_filter(regexp_split_to_array(text, '\\s+'),"
            " t -> t != ''))) FROM read_parquet('" + sf + "/documents.parquet')"
        ).fetchone()
        # cap is 512 * 10001 tokens; demand two orders of magnitude slack
        assert mx < 512 * 10001 / 100, (sf, mx)
