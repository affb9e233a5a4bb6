"""Semantics tests for the round-5 operators, with planted inputs the
fixture corpus lacks (random text has no intra-doc repeated passages,
and cross-source exact dups only appear at sf0.1)."""

import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans.catalog import QUERIES

from .conftest import SF01


def _passage_dedup_frame(spark, rows):
    """Planted inputs through THE SAME function the catalog query calls
    (functions/text.dedup_passages — round-5 review finding replaced the
    previous inline copy of the expressions)."""
    from sportstv_streaming_data_warehouse_spark.functions.text import (
        dedup_passages,
    )

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return dedup_passages(df, "doc_id", "text", passage_tokens=10)


BLOCK = "a b c d e f g h i j"          # one exact 10-token passage
TAIL = "k l m n o p q r s t"


def test_passage_dedup_removes_planted_repeats(spark):
    # doc 1: BLOCK x3 then TAIL -> 4 passages, 2 kept, first-occurrence
    # order preserved
    out = {
        r["doc_id"]: r
        for r in _passage_dedup_frame(
            spark,
            [
                (1, f"{BLOCK} {BLOCK} {BLOCK} {TAIL}"),
                (2, f"{BLOCK} {TAIL}"),  # no repeats: identity
            ],
        ).collect()
    }
    assert (out[1]["n_segments"], out[1]["n_kept"]) == (4, 2)
    assert out[1]["cleaned_text"] == f"{BLOCK} {TAIL}"
    assert (out[2]["n_segments"], out[2]["n_kept"]) == (2, 2)
    assert out[2]["cleaned_text"] == f"{BLOCK} {TAIL}"


def test_passage_dedup_partial_last_segment_and_empty(spark):
    rows = [
        (1, "x y z"),   # single short passage, kept whole
        (2, "   "),     # whitespace-only: filtered out entirely
    ]
    got = _passage_dedup_frame(spark, rows).collect()
    assert len(got) == 1
    assert got[0]["doc_id"] == 1
    assert got[0]["n_segments"] == 1 and got[0]["cleaned_text"] == "x y z"


def test_passage_dedup_catalog_matches_identity_on_fixture(spark):
    # the fixture corpus has no intra-doc repeats (verified in DuckDB),
    # so the operator must be a pure pass-through there: n_kept equals
    # n_segments on every row AND the cleaned token count equals the
    # original token count (catches slice/join regressions that keep
    # segment counts but corrupt cleaned_text — round-5 review finding)
    from sportstv_streaming_data_warehouse_spark.sources.fixtures import load_table

    out = QUERIES["x_passage_dedup"](spark, SF01)
    bad = out.filter(F.col("n_kept") != F.col("n_segments")).count()
    assert bad == 0
    ntok = lambda c: F.size(F.filter(F.split(c, r"\s+"), lambda t: t != ""))  # noqa: E731
    docs = load_table(spark, SF01, "documents").select(
        "doc_id", ntok(F.col("text")).alias("n_orig")
    )
    mism = (
        out.select("doc_id", ntok(F.col("cleaned_text")).alias("n_clean"))
        .join(docs, "doc_id")
        .filter(F.col("n_clean") != F.col("n_orig"))
        .count()
    )
    assert mism == 0


def test_source_overlap_counts_planted_cross_dups(spark):
    from sportstv_streaming_data_warehouse_spark.functions.text import fingerprint

    rows = [
        (1, "shared one", "A"),
        (2, "shared one", "B"),     # A-B overlap
        (3, "shared two", "A"),
        (4, "shared two", "B"),     # A-B overlap (2nd fp)
        (5, "shared three", "B"),
        (6, "shared three", "C"),   # B-C overlap
        (7, "only a", "A"),
        (8, "dup inside a", "A"),
        (9, "dup inside a", "A"),   # same source: counts once on diagonal
    ]
    from sportstv_streaming_data_warehouse_spark.functions.text import (
        source_overlap_matrix,
    )

    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        (r["source_a"], r["source_b"]): r["shared_fingerprints"]
        for r in source_overlap_matrix(docs, "source", "text").collect()
    }
    assert got[("A", "B")] == 2
    assert got[("B", "C")] == 1
    assert ("A", "C") not in got
    assert got[("A", "A")] == 4   # distinct fps in A (dup text counts once)
    assert got[("B", "B")] == 3
    assert got[("C", "C")] == 1


def test_seq_length_histogram_bucket_edges(spark, tmp_path):
    import pandas as pd

    # token counts 1,2,3,5,8,33 -> bucket_hi 1,2,4,8,8,64
    texts = {1: "w", 2: "w " * 2, 3: "w " * 3, 5: "w " * 5,
             8: "w " * 8, 33: "w " * 33}
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "text": [t.strip() for t in texts.values()],
            "lang": "en",
            "source": "s",
            "n_chars": [len(t) for t in texts.values()],
        }
    )
    d = str(tmp_path)
    pdf.to_parquet(f"{d}/documents.parquet")
    out = {
        r["bucket_hi"]: (r["n_docs"], r["total_tokens"], r["doc_share"])
        for r in QUERIES["x_seq_length_histogram"](spark, d).collect()
    }
    assert out[1] == (1, 1, pytest.approx(1 / 6))
    assert out[2] == (1, 2, pytest.approx(1 / 6))
    assert out[4] == (1, 3, pytest.approx(1 / 6))
    assert out[8] == (2, 13, pytest.approx(2 / 6))
    assert out[64] == (1, 33, pytest.approx(1 / 6))
    assert sum(v[2] for v in out.values()) == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# Round-5 second batch: cohort retention, funnel, transitions, inter-
# arrival, token entropy, key-skew report, Pareto/ABC — planted inputs
# with hand-computed expectations, run through the REAL catalog entry
# (tables written as parquet into tmp_path, the sf_dir contract).
# ---------------------------------------------------------------------------

import datetime as _dt
import math


def _write_events(spark, d, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")


_T0 = _dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(seconds):
    return _T0 + _dt.timedelta(seconds=seconds)


def test_event_funnel_strictly_after_semantics(spark, tmp_path):
    d = str(tmp_path)
    _write_events(spark, d, [
        # user 1: full ordered funnel
        (1, _ts(0), 1, "view", 0.0, "{}"),
        (2, _ts(10), 1, "click", 0.0, "{}"),
        (3, _ts(20), 1, "purchase", 0.0, "{}"),
        # user 2: click BEFORE first view -> no qualifying click
        (4, _ts(0), 2, "click", 0.0, "{}"),
        (5, _ts(10), 2, "view", 0.0, "{}"),
        # user 3: purchase BEFORE qualifying click -> stops at click
        (6, _ts(0), 3, "view", 0.0, "{}"),
        (7, _ts(5), 3, "purchase", 0.0, "{}"),
        (8, _ts(10), 3, "click", 0.0, "{}"),
        # user 4: purchase only -> not in funnel at all
        (9, _ts(0), 4, "purchase", 0.0, "{}"),
    ])
    row = QUERIES["w_event_funnel"](spark, d).collect()[0]
    assert (row["n_view"], row["n_click"], row["n_purchase"]) == (3, 2, 1)
    assert row["click_rate"] == pytest.approx(2 / 3)
    assert row["purchase_rate"] == pytest.approx(1 / 3)


def test_event_transitions_bigrams_and_shares(spark, tmp_path):
    d = str(tmp_path)
    _write_events(spark, d, [
        (1, _ts(0), 1, "view", 0.0, "{}"),
        (2, _ts(1), 1, "click", 0.0, "{}"),
        (3, _ts(2), 1, "purchase", 0.0, "{}"),
        (4, _ts(0), 2, "view", 0.0, "{}"),
        (5, _ts(1), 2, "click", 0.0, "{}"),
        (6, _ts(99), 3, "error", 0.0, "{}"),  # singleton: no transition
    ])
    out = {
        (r["from_type"], r["to_type"]): (r["n"], r["share"])
        for r in QUERIES["w_event_transitions"](spark, d).collect()
    }
    assert out[("view", "click")] == (2, pytest.approx(2 / 3))
    assert out[("click", "purchase")] == (1, pytest.approx(1 / 3))
    assert set(out) == {("view", "click"), ("click", "purchase")}


def test_event_transitions_tie_broken_by_event_id(spark, tmp_path):
    d = str(tmp_path)
    # identical timestamps: order must follow event_id
    _write_events(spark, d, [
        (1, _ts(0), 1, "view", 0.0, "{}"),
        (2, _ts(0), 1, "click", 0.0, "{}"),
        (3, _ts(0), 1, "purchase", 0.0, "{}"),
    ])
    out = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in QUERIES["w_event_transitions"](spark, d).collect()
    }
    assert out == {("view", "click"): 1, ("click", "purchase"): 1}


def test_interarrival_gap_stats(spark, tmp_path):
    d = str(tmp_path)
    _write_events(spark, d, [
        (1, _ts(0), 1, "click", 0.0, "{}"),
        (2, _ts(10), 1, "click", 0.0, "{}"),
        (3, _ts(30), 1, "click", 0.0, "{}"),
        # other user's clicks must NOT mix into user 1's gaps
        (4, _ts(1000), 2, "click", 0.0, "{}"),
        (5, _ts(1005), 2, "click", 0.0, "{}"),
        (6, _ts(0), 1, "view", 0.0, "{}"),   # singleton type: no gap
    ])
    out = {r["event_type"]: r for r in
           QUERIES["w_interarrival_stats"](spark, d).collect()}
    c = out["click"]
    assert c["n_gaps"] == 3  # user1: 10s, 20s; user2: 5s
    assert c["avg_gap_s"] == pytest.approx((10 + 20 + 5) / 3)
    assert c["min_gap_s"] == pytest.approx(5.0)
    assert c["max_gap_s"] == pytest.approx(20.0)
    assert "view" not in out


def _write_orders(spark, d, rows):
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")


def test_cohort_retention_matrix(spark, tmp_path):
    d = str(tmp_path)
    jan, mar = _dt.datetime(2024, 1, 5), _dt.datetime(2024, 3, 20)
    _write_orders(spark, d, [
        (1, 101, "F", 10.0, jan, "1-URGENT"),   # c101 cohort 2024-01
        (2, 101, "F", 10.0, mar, "1-URGENT"),   # ... active at offset 2
        (3, 102, "F", 10.0, jan, "1-URGENT"),   # c102 cohort 2024-01 only
        (4, 103, "F", 10.0, mar, "1-URGENT"),   # c103 cohort 2024-03
    ])
    out = {
        (r["cohort_month"], r["month_offset"]): r
        for r in QUERIES["a_cohort_retention"](spark, d).collect()
    }
    r0 = out[("2024-01", 0)]
    assert (r0["active_customers"], r0["cohort_size"]) == (2, 2)
    assert r0["retention"] == 1.0
    r2 = out[("2024-01", 2)]
    assert (r2["active_customers"], r2["cohort_size"]) == (1, 2)
    assert r2["retention"] == 0.5
    r3 = out[("2024-03", 0)]
    assert (r3["active_customers"], r3["cohort_size"]) == (1, 1)
    assert set(out) == {("2024-01", 0), ("2024-01", 2), ("2024-03", 0)}


def test_token_entropy_known_values(spark, tmp_path):
    import pandas as pd

    d = str(tmp_path)
    pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a a a a", "a b c d", "a a b b"],
        "lang": "en", "source": "s", "n_chars": 7,
    }).to_parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: r for r in
           QUERIES["x_token_entropy"](spark, d).collect()}
    assert (out[1]["n_tokens"], out[1]["n_types"]) == (4, 1)
    assert out[1]["entropy_nats"] == pytest.approx(0.0, abs=1e-4)
    assert out[2]["entropy_nats"] == pytest.approx(round(math.log(4), 4))
    assert out[3]["entropy_nats"] == pytest.approx(round(math.log(2), 4))


def test_key_skew_report_ranks_and_shares(spark, tmp_path):
    d = str(tmp_path)
    rows, eid = [], 0
    for uid, n in [(1, 5), (2, 3), (3, 1)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, _ts(eid), uid, "view", 0.0, "{}"))
    _write_events(spark, d, rows)
    out = QUERIES["q_key_skew_report"](spark, d).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    top = out[0]
    assert (top["user_id"], top["cnt"]) == (1, 5)
    assert (top["total_rows"], top["n_keys"]) == (9, 3)
    assert top["share"] == pytest.approx(5 / 9)
    assert top["x_over_avg"] == pytest.approx(5 * 3 / 9)


def _write_lineitem(spark, d, rows):
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity double, "
        "l_extendedprice double"
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")


def test_pareto_abc_banding(spark, tmp_path):
    d = str(tmp_path)
    # revenues 80 / 15 / 5 -> cum shares 0.80, 0.95, 1.00 -> A, B, C
    _write_lineitem(spark, d, [
        (1, 10, 1.0, 50.0), (2, 10, 1.0, 30.0),  # part 10: 80
        (3, 20, 1.0, 15.0),                       # part 20: 15
        (4, 30, 1.0, 5.0),                        # part 30: 5
    ])
    out = {r["l_partkey"]: r for r in
           QUERIES["a_pareto_abc"](spark, d).collect()}
    assert [out[k]["rank"] for k in (10, 20, 30)] == [1, 2, 3]
    assert out[10]["abc_class"] == "A"
    assert out[10]["cum_share"] == pytest.approx(0.80)
    assert out[20]["abc_class"] == "B"
    assert out[20]["cum_share"] == pytest.approx(0.95)
    assert out[30]["abc_class"] == "C"
    assert out[30]["cum_share"] == pytest.approx(1.0)


def test_pareto_abc_revenue_ties_broken_by_partkey(spark, tmp_path):
    d = str(tmp_path)
    _write_lineitem(spark, d, [
        (1, 7, 1.0, 10.0), (2, 5, 1.0, 10.0), (3, 9, 1.0, 10.0),
    ])
    out = QUERIES["a_pareto_abc"](spark, d).orderBy("rank").collect()
    assert [r["l_partkey"] for r in out] == [5, 7, 9]
    assert [r["rank"] for r in out] == [1, 2, 3]
