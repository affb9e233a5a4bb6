"""Semantics tests for the round-5 operators, with planted inputs the
fixture corpus lacks (random text has no intra-doc repeated passages,
and cross-source exact dups only appear at sf0.1)."""

import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans.catalog import QUERIES

from .conftest import SF01


def _passage_dedup_frame(spark, rows):
    """Run the x_passage_dedup plan body against an arbitrary frame by
    monkey-free reuse: the catalog query reads from sf_dir, so for
    planted inputs we inline the same expressions."""
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    n_seg = F.ceil(F.size(toks) / F.lit(10.0)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(toks, i * 10 + 1, 10), " "),
    )
    kept = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(F.array_contains(acc, s), acc).otherwise(
            F.concat(acc, F.array(s))
        ),
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return df.filter(F.size(toks) > 0).select(
        "doc_id",
        F.size(segs).alias("n_segments"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, " ").alias("cleaned_text"),
    )


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
    # n_segments on every row and cleaned token count equals the
    # original token count
    out = QUERIES["x_passage_dedup"](spark, SF01)
    bad = out.filter(F.col("n_kept") != F.col("n_segments")).count()
    assert bad == 0


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
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    h = docs.select("source", fingerprint(F.col("text")).alias("fp")).distinct()
    a, b = h.alias("a"), h.alias("b")
    got = {
        (r["source_a"], r["source_b"]): r["shared_fingerprints"]
        for r in a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") <= F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("shared_fingerprints"))
        .collect()
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
