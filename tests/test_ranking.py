"""Distributed ranking: exact equivalence with the single-partition
window functions it replaces, and plan shape (no unpartitioned window —
no single task ever holds the whole dataset)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.operators.ranking import (
    distributed_ntile,
    with_global_row_number,
)
from sportstv_streaming_data_warehouse_spark.plans.catalog import all_queries

from .conftest import SF01


def _df(spark, n=997):
    # heavy value ties (5 distinct scores) force the id tiebreaker and
    # make several rank buckets share one score value
    return spark.range(n).select(
        F.col("id"), (F.col("id") % 5).cast("double").alias("score")
    )


def test_row_number_matches_global_window(spark):
    df = _df(spark)
    got = {
        r["id"]: r["row_num"]
        for r in with_global_row_number(df, ["score", "id"]).collect()
    }
    w = Window.orderBy("score", "id")
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,k", [(997, 10), (7, 10), (1000, 7), (0, 4)])
def test_ntile_matches_global_window(spark, n, k):
    df = _df(spark, n)
    got = {
        r["id"]: r["tile"]
        for r in distributed_ntile(df, k, ["score", "id"]).collect()
    }
    w = Window.orderBy("score", "id")
    want = {
        r["id"]: r["t"]
        for r in df.withColumn("t", F.ntile(k).over(w)).collect()
    }
    assert got == want


def test_quality_deciles_plan_has_no_global_sort(spark):
    """The catalog query must not plan a single-partition sort of the
    corpus: no unpartitioned ntile window, no Exchange SinglePartition in
    the returned plan (the stats passes are separate tiny jobs)."""
    df = all_queries()["x_quality_deciles"](spark, SF01)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan
    assert "Exchange SinglePartition" not in plan


def test_running_total_matches_global_window(spark):
    from sportstv_streaming_data_warehouse_spark.operators.ranking import (
        with_running_total,
    )

    df = _df(spark).withColumn("v", (F.col("id") % 13) + 1)
    got = {
        r["id"]: r["rt"]
        for r in with_running_total(df, ["score", "id"], "v", out_col="rt").collect()
    }
    w = (
        Window.orderBy("score", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["id"]: r["rt"] for r in df.withColumn("rt", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_running_total_preserves_fractional_sums(spark):
    """Double value column: running totals must not be truncated to long
    (round-2 ADVICE finding — the old cast('long') dropped fractions)."""
    from sportstv_streaming_data_warehouse_spark.operators.ranking import (
        with_running_total,
    )

    df = _df(spark, 101).withColumn(
        "v", (F.col("id") % 7).cast("double") / F.lit(4.0)
    )
    out = with_running_total(df, ["score", "id"], "v", out_col="rt")
    assert dict(out.dtypes)["rt"] == "double"
    got = {r["id"]: r["rt"] for r in out.collect()}
    w = (
        Window.orderBy("score", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["id"]: r["rt"] for r in df.withColumn("rt", F.sum("v").over(w)).collect()
    }
    assert got == pytest.approx(want)


def test_string_leading_order_column_rejected(spark):
    """Lexicographic order has no monotone numeric surrogate: '10' < '9'
    lexically but 10.0 > 9.0 — bucketing on a double cast would silently
    corrupt ranks, so the operator must refuse (round-2 ADVICE finding)."""
    df = _df(spark, 50).withColumn("s", F.col("id").cast("string"))
    with pytest.raises(ValueError, match="numeric, date, or timestamp"):
        with_global_row_number(df, ["s", "id"]).collect()


def test_date_leading_order_column_buckets_natively(spark):
    """Date keys map to epoch seconds (order-preserving) instead of the
    old cast('double') which nulled every date into one bucket."""
    df = spark.range(400).select(
        "id", F.date_add(F.lit("2020-01-01"), (F.col("id") % 97).cast("int")).alias("d")
    )
    got = {
        r["id"]: r["row_num"]
        for r in with_global_row_number(df, ["d", "id"]).collect()
    }
    w = Window.orderBy("d", "id")
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_running_max_matches_global_window(spark):
    from sportstv_streaming_data_warehouse_spark.operators.ranking import (
        with_running_max,
    )

    # sawtooth values: the running max advances and plateaus across
    # bucket boundaries (the cross-bucket prefix-max path)
    df = spark.range(500).select(
        "id", ((F.col("id") * 37) % 113).cast("long").alias("v")
    )
    got = {
        r["id"]: r["m"]
        for r in with_running_max(
            df, ["id"], "v", out_col="m", n_buckets=16
        ).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: r["m"]
        for r in df.withColumn("m", F.max("v").over(w)).collect()
    }
    assert got == want


def test_running_max_on_timestamps(spark):
    from sportstv_streaming_data_warehouse_spark.operators.ranking import (
        with_running_max,
    )

    df = spark.range(300).select(
        "id",
        F.to_timestamp(
            F.lit("2024-01-01 00:00:00")
        ).alias("base"),
    ).select(
        "id",
        (F.col("base") + F.make_interval(secs=((F.col("id") * 7919) % 1000).cast("double"))).alias("ts"),
    )
    got = {
        r["id"]: r["m"]
        for r in with_running_max(
            df, ["id"], "ts", out_col="m", n_buckets=8
        ).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: r["m"]
        for r in df.withColumn("m", F.max("ts").over(w)).collect()
    }
    assert got == want


def test_fused_rank_and_running_total_equals_the_composed_primitives(spark):
    """round-12 perf: the fused one-pass form must be value-identical to
    with_global_row_number + with_running_total composed (same ordering,
    same exact decimal accumulation)."""
    from decimal import Decimal

    from sportstv_streaming_data_warehouse_spark.operators.ranking import (
        with_global_row_number,
        with_rank_and_running_total,
        with_running_total,
    )

    rows = [(i, Decimal(str((i * 37) % 19 + 0.25))) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, v decimal(18,2)")
    fused = {
        r["k"]: (r["rank"], r["cum"])
        for r in with_rank_and_running_total(
            df, ["v", "k"], "v", rank_col="rank", total_col="cum"
        ).collect()
    }
    composed_df = with_running_total(
        with_global_row_number(df, ["v", "k"], out_col="rank"),
        ["v", "k"], "v", out_col="cum",
    )
    composed = {
        r["k"]: (r["rank"], r["cum"]) for r in composed_df.collect()
    }
    assert fused == composed
    # sanity: ranks are a permutation of 1..n and the last cum is the total
    assert sorted(r for r, _ in fused.values()) == list(range(1, 201))
    top = max(fused.values())
    assert top[1] == sum(v for _, v in rows)
