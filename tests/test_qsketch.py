"""Log-bucket quantile sketch (operators/sketches.qsketch_*): bucket
math at octave boundaries, the relative-error contract on randomized
values, mergeability (sum of partial sketches == sketch of the union),
and the underflow cell."""

import math
import random

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.operators.sketches import (
    qsketch_bucket,
    qsketch_bucket_estimate,
)


def _buckets(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["m"])
    out = df.select(
        "m",
        qsketch_bucket(F.col("m")).alias("b"),
        qsketch_bucket_estimate(qsketch_bucket(F.col("m"))).alias("est"),
    )
    return {r["m"]: (r["b"], r["est"]) for r in out.collect()}


def test_bucket_boundaries_and_underflow(spark):
    got = _buckets(spark, [0, -5, 1, 15, 16, 17, 31, 32, 1024, 1040])
    assert got[0][0] == -1 and got[0][1] == 0
    assert got[-5][0] == -1
    # m=1: e=0, sub = floor(16/1)-16 = 0 -> bucket 0
    assert got[1][0] == 0
    # m=16: e=4, sub = floor(256/16)-16 = 0 -> bucket 64; first value of
    # the octave
    assert got[16][0] == 64
    # m=17: sub = floor(272/16)-16 = 1 -> bucket 65
    assert got[17][0] == 65
    # m=31: sub = floor(496/16)-16 = 15 -> last sub-bucket of octave 4
    assert got[31][0] == 64 + 15
    # m=32: next octave starts exactly at the boundary (no float fuzz)
    assert got[32][0] == 80
    # m=1024 = 2^10: bucket 160, estimate = floor(1024*33/32) = 1056
    assert got[1024] == (160, 1056)


def test_relative_error_contract_randomized(spark):
    rng = random.Random(614)
    vals = [rng.randint(1, 10**9) for _ in range(400)] + [
        2**k + off for k in range(1, 30) for off in (-1, 0, 1)
    ]
    got = _buckets(spark, sorted(set(v for v in vals if v >= 1)))
    for m, (b, est) in got.items():
        assert abs(est - m) * 32 <= m + 32, (m, b, est)
        # bucket id is what a python replica computes
        e = m.bit_length() - 1
        sub = (m * 16) // (1 << e) - 16
        assert b == e * 16 + sub, (m, b)


def test_full_long_domain_no_overflow(spark):
    """Round-6 advisor finding: the old multiply-then-divide bucket
    wrapped for m > 2^59 and rounded past 2^53; the shiftright form
    must match the arbitrary-precision python replica up to Long.MAX,
    and the midpoint estimate must stay positive (no wrap) and inside
    the 1/32 relative-error band at the top octaves."""
    vals = sorted(
        {2**k + off for k in range(45, 63) for off in (-1, 0, 1, 12345)}
        | {2**63 - 1, 10**18, 10**18 + 7}
    )
    got = _buckets(spark, vals)
    for m, (b, est) in got.items():
        e = m.bit_length() - 1
        sub = (m * 16) // (1 << e) - 16
        assert b == e * 16 + sub, (m, b)
        gt_est = ((33 + 2 * sub) << e) >> 5
        assert est == gt_est, (m, est, gt_est)
        assert est > 0
        assert abs(est - m) * 32 <= m + 32, (m, b, est)


def test_merge_of_partial_sketches_is_sketch_of_union(spark):
    rng = random.Random(7)
    part_a = [(1, rng.randint(1, 10**6)) for _ in range(300)]
    part_b = [(2, rng.randint(1, 10**6)) for _ in range(300)]
    df = spark.createDataFrame(part_a + part_b, ["part", "m"])
    per_part = (
        df.groupBy("part", qsketch_bucket(F.col("m")).alias("b"))
        .agg(F.count("*").alias("c"))
        .groupBy("b")
        .agg(F.sum("c").alias("c"))
    )
    direct = df.groupBy(qsketch_bucket(F.col("m")).alias("b")).agg(
        F.count("*").alias("c")
    )
    a = sorted((r["b"], r["c"]) for r in per_part.collect())
    b = sorted((r["b"], r["c"]) for r in direct.collect())
    assert a == b


def test_catalog_quantile_rollup_accuracy_in_band(spark):
    from sportstv_streaming_data_warehouse_spark.plans.catalog import QUERIES

    from .conftest import SF001

    rows = QUERIES["h_sketch_rollup_quantile"](spark, SF001).collect()
    assert rows
    assert all(r["p50_ok"] and r["p95_ok"] for r in rows)
