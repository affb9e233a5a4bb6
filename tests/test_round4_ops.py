"""Semantic tests for the round-4 operators, beyond the DuckDB oracle
parity gate: grouped top-fraction selection must equal the plain
per-group window semantics on adversarial shapes, BM25 must behave at
the edges the sf fixtures don't exercise, and the global shuffle must be
a permutation."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.functions.text import bm25_top_docs
from sportstv_streaming_data_warehouse_spark.operators.ranking import (
    grouped_top_fraction,
)

from .conftest import SF01


def _window_reference(df, group, order, idc, permille):
    """ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC, id) <= ceil."""
    w = Window.partitionBy(group).orderBy(F.desc(order), F.asc(idc))
    wg = Window.partitionBy(group)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(wg))
        .filter(F.col("__rn") <= (F.col("__n") * permille + 999) / 1000)
        .drop("__rn", "__n")
    )


def _assert_same_set(a_df, b_df, key_cols):
    a = sorted(tuple(r) for r in a_df.select(*key_cols).collect())
    b = sorted(tuple(r) for r in b_df.select(*key_cols).collect())
    assert a == b, f"kept-set mismatch: {len(a)} vs {len(b)} rows"


def test_grouped_top_fraction_matches_window_semantics(spark):
    rng = random.Random(7)
    rows = [
        (i, f"g{rng.randrange(4)}", float(rng.randrange(100)))
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, ["id", "grp", "val"])
    for permille in (1, 200, 500, 997, 1000):
        got = grouped_top_fraction(
            df, "grp", "val", "id", keep_permille=permille, n_buckets=8
        )
        want = _window_reference(df, "grp", "val", "id", permille)
        _assert_same_set(got, want, ["id", "grp"])


def test_grouped_top_fraction_heavy_ties_and_constant_group(spark):
    # ties spanning the quota boundary + one group with a constant value
    # (degenerate single-bucket path) + a singleton group
    rows = (
        [(i, "ties", float(i % 3)) for i in range(100)]
        + [(1000 + i, "const", 5.0) for i in range(50)]
        + [(2000, "solo", 1.0)]
    )
    df = spark.createDataFrame(rows, ["id", "grp", "val"])
    got = grouped_top_fraction(df, "grp", "val", "id", keep_permille=300, n_buckets=8)
    want = _window_reference(df, "grp", "val", "id", 300)
    _assert_same_set(got, want, ["id", "grp"])


def test_grouped_top_fraction_rejects_bad_permille(spark):
    df = spark.createDataFrame([(1, "g", 1.0)], ["id", "grp", "val"])
    for bad in (0, -5, 1001):
        try:
            grouped_top_fraction(df, "grp", "val", "id", keep_permille=bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


def test_bm25_all_terms_absent_returns_empty(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")], ["doc_id", "text"]
    )
    out = bm25_top_docs(df, "doc_id", "text", ["zzz", "qqq"], top_k=5)
    assert out.count() == 0


def test_bm25_rarity_beats_frequency_across_docs(spark):
    # 'rare' appears in 1 of 4 docs, 'common' in all 4 with equal tf and
    # equal doc lengths -> the rare-term doc must outrank common-only docs
    df = spark.createDataFrame(
        [
            (1, "rare common pad1 pad2"),
            (2, "common x pad1 pad2"),
            (3, "common y pad1 pad2"),
            (4, "common z pad1 pad2"),
        ],
        ["doc_id", "text"],
    )
    out = bm25_top_docs(df, "doc_id", "text", ["rare", "common"], top_k=4)
    rows = out.orderBy(F.desc("bm25"), F.asc("doc_id")).collect()
    assert rows[0]["doc_id"] == 1 and rows[0]["n_matched"] == 2
    assert all(r["n_matched"] == 1 for r in rows[1:])


def test_global_shuffle_is_a_permutation(spark):
    from sportstv_streaming_data_warehouse_spark.plans.catalog import QUERIES

    out = QUERIES["x_global_shuffle"](spark, SF01).collect()
    positions = sorted(r["position"] for r in out)
    assert positions == list(range(1, len(out) + 1))
    assert len({r["doc_id"] for r in out}) == len(out)
