"""Approximate-distinct scale variant: HLL estimates must track the exact
counts the oracle-matched queries compute (SURVEY §7.2 M5).

Since round 5 the query itself is oracle-backed: it emits the exact
count plus a deterministic `within_bound` flag pinned to TRUE by the
DuckDB oracle, so the driver hash verifies the sketch contract.  This
test additionally bounds the raw estimate (which the hashed output
excludes, being engine-specific)."""

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans.catalog import QUERIES
from sportstv_streaming_data_warehouse_spark.sources.fixtures import load_table

from .conftest import SF01


def _exact(spark):
    return {
        r["year"]: r["orders"]
        for r in load_table(spark, SF01, "lineitem")
        .groupBy(F.year(F.to_date("l_shipdate")).alias("year"))
        .agg(F.countDistinct("l_orderkey").alias("orders"))
        .collect()
    }


def test_query_pins_exact_and_bound_flag(spark):
    rows = QUERIES["a2_approx_distinct_scale"](spark, SF01).collect()
    exact = _exact(spark)
    assert {r["year"] for r in rows} == set(exact)
    for r in rows:
        assert r["exact_orders"] == exact[r["year"]]
        assert r["within_bound"] is True, (
            f"year {r['year']}: HLL estimate violated the 2.5*rsd contract"
        )


def test_raw_estimate_within_tolerance(spark):
    approx = {
        r["year"]: r["approx_orders"]
        for r in load_table(spark, SF01, "lineitem")
        .groupBy(F.year(F.to_date("l_shipdate")).alias("year"))
        .agg(F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"))
        .collect()
    }
    exact = _exact(spark)
    assert set(approx) == set(exact)
    for y, est in approx.items():
        rel_err = abs(est - exact[y]) / exact[y]
        assert rel_err < 0.05, f"year {y}: approx {est} vs exact {exact[y]}"
