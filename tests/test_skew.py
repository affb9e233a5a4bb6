"""Salted-skew operators: results must equal the unsalted plans exactly,
with the hot key's work spread across salt buckets."""

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)


def _skewed_df(spark, n=50_000, hot_frac=0.9):
    # 90% of rows share one key — the pathological shuffle shape
    return spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.rand(seed=7) < hot_frac, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
        .alias("key"),
        (F.col("id") % 100).cast("double").alias("v"),
    ).cache()


def test_salted_aggregate_matches_plain(spark):
    df = _skewed_df(spark)
    salted = salted_aggregate(df, ["key"], ["v"], salt_from="row_id", n_salts=8)
    plain = df.groupBy("key").agg(
        F.count("*").alias("n"), F.sum("v").alias("sum_v")
    )
    a = {r["key"]: (r["n"], r["sum_v"]) for r in salted.collect()}
    b = {r["key"]: (r["n"], r["sum_v"]) for r in plain.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == b[k][0]
        assert abs(a[k][1] - b[k][1]) < 1e-6 * max(abs(b[k][1]), 1.0)
    # phase 1 really spread the hot key across salts
    phase1 = (
        df.withColumn("__salt", F.pmod(F.xxhash64("row_id"), F.lit(8)))
        .filter(F.col("key") == "HOT")
        .select("__salt").distinct().count()
    )
    assert phase1 == 8


def test_salted_join_matches_plain(spark):
    big = _skewed_df(spark, n=20_000)
    small = spark.createDataFrame(
        [("HOT", "hot-cat")] + [(f"k{i}", f"cat{i}") for i in range(50)],
        ["key", "category"],
    )
    salted = salted_join(big, small, on="key", salt_from="row_id", n_salts=8)
    plain = big.join(small, "key")
    assert salted.count() == plain.count()
    a = salted.groupBy("category").count().collect()
    b = plain.groupBy("category").count().collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
