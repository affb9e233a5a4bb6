"""Approximate-distinct scale variant: HLL estimates must track the exact
counts the oracle-matched queries compute (SURVEY §7.2 M5)."""

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans.catalog import QUERIES
from sportstv_streaming_data_warehouse_spark.sources.fixtures import load_table

from .conftest import SF01


def test_approx_distinct_within_tolerance(spark):
    approx = {
        r["year"]: r["approx_orders"]
        for r in QUERIES["a2_approx_distinct_scale"](spark, SF01).collect()
    }
    exact = {
        r["year"]: r["orders"]
        for r in load_table(spark, SF01, "lineitem")
        .groupBy(F.year(F.to_date("l_shipdate")).alias("year"))
        .agg(F.countDistinct("l_orderkey").alias("orders"))
        .collect()
    }
    assert set(approx) == set(exact)
    for y, est in approx.items():
        rel_err = abs(est - exact[y]) / exact[y]
        assert rel_err < 0.05, f"year {y}: approx {est} vs exact {exact[y]}"
