"""As-of and range join operators: semantics against hand-built
expectations, plan shape (equi-join, not nested-loop), and the as-of
tolerance horizon."""

import datetime as dt

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.operators.asof import asof_join
from sportstv_streaming_data_warehouse_spark.operators.ranges import range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_semantics_and_tolerance(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00")),
            (2, _ts("2024-01-01T12:00:00")),
            (3, _ts("2024-01-01T09:00:00")),  # before any right row
        ],
        ["id", "ts"],
    ).withColumn("user", F.lit(1))
    right = spark.createDataFrame(
        [
            (_ts("2024-01-01T10:00:00"), 100.0),  # same instant as id=1
            (_ts("2024-01-01T11:30:00"), 200.0),
        ],
        ["ts", "price"],
    ).withColumn("user", F.lit(1))

    out = {
        r["id"]: r["asof_price"]
        for r in asof_join(
            left, right, on="user", left_ts="ts", right_ts="ts", value_cols=["price"]
        ).collect()
    }
    # inclusive: the 10:00 right row matches the 10:00 left row
    assert out == {1: 100.0, 2: 200.0, 3: None}

    # 15-minute tolerance: id=2 (last right row 30 min earlier) nulls out
    out_tol = {
        r["id"]: r["asof_price"]
        for r in asof_join(
            left, right, on="user", left_ts="ts", right_ts="ts",
            value_cols=["price"], tolerance_seconds=900,
        ).collect()
    }
    assert out_tol == {1: 100.0, 2: None, 3: None}


def test_asof_matches_pandas_merge_asof(spark):
    """Random workloads vs pandas merge_asof (an independent reference
    implementation with identical inclusive-backward semantics)."""
    import random

    import pandas as pd

    rng = random.Random(99)
    base = dt.datetime(2024, 1, 1)
    left_rows = [
        (i, rng.randrange(4), base + dt.timedelta(minutes=rng.randrange(5000)))
        for i in range(300)
    ]
    right_rows = [
        (rng.randrange(4), base + dt.timedelta(minutes=rng.randrange(5000)), float(j))
        for j in range(60)
    ]
    left = spark.createDataFrame(left_rows, ["id", "user", "ts"])
    right = spark.createDataFrame(right_rows, ["user", "ts", "price"])

    got = {
        r["id"]: r["asof_price"]
        for r in asof_join(
            left, right, on="user", left_ts="ts", right_ts="ts", value_cols=["price"]
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["id", "user", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["user", "ts", "price"]).sort_values("ts")
    merged = pd.merge_asof(
        lp, rp, on="ts", by="user", direction="backward", allow_exact_matches=True
    )
    expected = {
        int(r.id): (None if pd.isna(r.price) else float(r.price))
        for r in merged.itertuples()
    }
    assert got == expected


def test_range_join_matches_theta_join(spark):
    points = spark.range(0, 1000).select(
        F.col("id").alias("pid"), (F.col("id") % 97).cast("double").alias("v")
    )
    intervals = spark.range(0, 20).select(
        F.col("id").alias("iid"),
        (F.col("id") * 5).cast("double").alias("lo"),
        (F.col("id") * 5 + 7).cast("double").alias("hi"),
    )
    fast = range_join(points, intervals, "v", "lo", "hi", bucket_size=8.0)
    slow = points.join(
        intervals, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
    )
    assert fast.count() == slow.count()
    a = sorted((r["pid"], r["iid"]) for r in fast.collect())
    b = sorted((r["pid"], r["iid"]) for r in slow.collect())
    assert a == b
    # the point: banding turns the theta join into a hash equi-join
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_asof_values_come_from_single_latest_row(spark):
    """If the truly-latest right row holds a NULL in one value column, that
    NULL is carried — values are never stitched from different rows
    (matches DuckDB ASOF row semantics)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"))], ["id", "ts"]
    ).withColumn("user", F.lit(1))
    right = spark.createDataFrame(
        [
            (_ts("2024-01-01T10:00:00"), 100.0, "a"),
            (_ts("2024-01-01T11:00:00"), None, "b"),  # latest row: NULL price
        ],
        ["ts", "price", "tag"],
    ).withColumn("user", F.lit(1))
    row = asof_join(
        left, right, on="user", left_ts="ts", right_ts="ts",
        value_cols=["price", "tag"],
    ).collect()[0]
    assert row["asof_tag"] == "b"
    assert row["asof_price"] is None  # NOT 100.0 from the older row
    assert row["asof_ts"] == _ts("2024-01-01T11:00:00")


def test_interval_overlap_join_matches_theta_join(spark):
    """Randomized interval×interval workload vs the naive overlap theta
    join — exactly-once per pair (the canonical-bucket rule needs no
    distinct), including pairs sharing many buckets and touching
    endpoints (inclusive overlap)."""
    from sportstv_streaming_data_warehouse_spark.operators.ranges import (
        interval_overlap_join,
    )

    left = spark.range(0, 300).select(
        F.col("id").alias("lid"),
        (F.col("id") * 7 % 211).alias("ls"),
        ((F.col("id") * 7 % 211) + (F.col("id") % 23)).alias("le"),
    )
    right = spark.range(0, 80).select(
        F.col("id").alias("rid"),
        (F.col("id") * 13 % 199).alias("rs"),
        ((F.col("id") * 13 % 199) + (F.col("id") % 37)).alias("re_"),
    )
    fast = interval_overlap_join(left, right, "ls", "le", "rs", "re_", 10)
    slow = left.join(
        right, (F.col("ls") <= F.col("re_")) & (F.col("rs") <= F.col("le"))
    )
    a = sorted((r["lid"], r["rid"]) for r in fast.collect())
    b = sorted((r["lid"], r["rid"]) for r in slow.collect())
    assert a == b
    assert len(a) == len(set(a))  # exactly once, not deduped-after
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_interval_overlap_touching_endpoints_inclusive(spark):
    from sportstv_streaming_data_warehouse_spark.operators.ranges import (
        interval_overlap_join,
    )

    left = spark.createDataFrame([(1, 0, 10)], ["lid", "ls", "le"])
    right = spark.createDataFrame(
        [(1, 10, 20), (2, 11, 20), (3, -5, 0), (4, -5, -1)],
        ["rid", "rs", "re_"],
    )
    got = sorted(
        r["rid"]
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re_", 7
        ).collect()
    )
    assert got == [1, 3]  # touching at 10 and at 0 match; disjoint do not
