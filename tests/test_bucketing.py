"""Bucketed-join tests: co-located tables must join with zero shuffle
exchanges — the strategy that replaces per-query shuffles for repeated
big⋈big joins at cluster scale."""

import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans.bucketing import (
    bucketed_join,
    write_bucketed,
)
from sportstv_streaming_data_warehouse_spark.sources.fixtures import load_table

from .conftest import SF01


@pytest.fixture(scope="module")
def bucketed(spark):
    od = load_table(spark, SF01, "orders")
    cu = load_table(spark, SF01, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    write_bucketed(od, "b_orders", "o_custkey", 8)
    write_bucketed(cu, "b_customer", "o_custkey", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    # disable auto-broadcast so the join strategy is genuinely the
    # big⋈big path the bucketing is designed for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # expose bucket sort order to the planner (single-file buckets only;
    # off by default since 3.0)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        joined = bucketed_join(spark, "b_orders", "b_customer", "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan
        # single-file sorted buckets: no per-query Sort either
        assert "Sort [o_custkey" not in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")


def test_bucketed_join_correct(spark, bucketed):
    joined = bucketed_join(spark, "b_orders", "b_customer", "o_custkey")
    plain = load_table(spark, SF01, "orders").join(
        load_table(spark, SF01, "customer").withColumnRenamed(
            "c_custkey", "o_custkey"
        ),
        "o_custkey",
    )
    assert joined.count() == plain.count()
    # decimal accumulation: order-independent, must match exactly
    dec = F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
    assert joined.agg(dec).first()[0] == plain.agg(dec).first()[0]
