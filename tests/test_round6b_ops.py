"""Semantics tests for the round-6 second-batch operators: Misra-Gries
heavy hitters (eviction actually exercised, unlike the near-uniform
fixture corpus), the HLL sketch rollup's in-band accuracy contract, the
purged temporal split's disjointness, PSI term math, and behavior-
sequence ordering under shuffled input."""

import math

import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.operators.sketches import (
    exact_heavy_hitters,
    mg_candidates,
)
from sportstv_streaming_data_warehouse_spark.plans.catalog import QUERIES

from .conftest import SF01


def _zipf_items(spark, n_partitions=4):
    # planted skew: 'hot' 600x, 'warm' 200x, a 400-key uniform tail of
    # 2 each (total 1600) — with k=8, true heavy hitters (freq > 200)
    # are exactly {'hot'}; 'warm' sits at the threshold boundary
    # (200 > 1600/8 = 200 is false) and must be EXCLUDED by the exact
    # recount even though MG will surface it as a candidate.
    rows = (
        [("hot",)] * 600
        + [("warm",)] * 200
        + [(f"tail{i}",) for i in range(400) for _ in (0, 1)]
    )
    return spark.createDataFrame(rows, ["item"]).repartition(n_partitions)


def test_mg_candidates_superset_and_bounded(spark):
    items = _zipf_items(spark)
    k = 8
    cand = {r["item"] for r in mg_candidates(items, "item", k).collect()}
    # superset guarantee: every true heavy hitter survives eviction
    assert "hot" in cand
    # bounded state: at most k counters per partition survive
    assert len(cand) <= k * items.rdd.getNumPartitions()


def test_exact_heavy_hitters_matches_full_groupby(spark):
    items = _zipf_items(spark)
    k = 8
    got = {
        r["item"]: r["n_occurrences"]
        for r in exact_heavy_hitters(items, "item", k).collect()
    }
    # ground truth from the full-vocabulary groupBy
    n = items.count()
    truth = {
        r["item"]: r["c"]
        for r in items.groupBy("item").agg(F.count("*").alias("c")).collect()
        if r["c"] > n / k
    }
    assert got == truth == {"hot": 600}  # 'warm' == threshold: excluded


def test_exact_heavy_hitters_exercises_eviction(spark):
    # single partition, k=2, vocabulary 3 — eviction MUST fire
    # (arrivals exceed counters); majority element still survives
    rows = [("a",)] * 10 + [("b",)] * 3 + [("c",)] * 3
    items = spark.createDataFrame(rows, ["item"]).coalesce(1)
    got = {r["item"] for r in exact_heavy_hitters(items, "item", 2).collect()}
    assert got == {"a"}  # only a has freq > 16/2


def test_hll_rollup_sketch_ok_everywhere(spark):
    out = QUERIES["h_sketch_rollup_hll"](spark, SF01).collect()
    assert out and all(r["sketch_ok"] for r in out)
    # weekly events must total the source row count
    assert sum(r["n_events"] for r in out) == 10000


def test_temporal_split_disjoint_and_complete(spark):
    rows = {r["split"]: r for r in QUERIES["x_temporal_split_purged"](spark, SF01).collect()}
    assert set(rows) == {"train", "embargo_dropped", "test"}
    assert sum(r["n_rows"] for r in rows.values()) == 10000
    # date ranges must be strictly ordered: train < embargo < test
    assert rows["train"]["max_date"] < rows["embargo_dropped"]["min_date"]
    assert rows["embargo_dropped"]["max_date"] < rows["test"]["min_date"]
    # embargo zone is exactly 2 days, test exactly 7
    assert rows["embargo_dropped"]["min_date"] != rows["embargo_dropped"]["max_date"]


def test_psi_terms_recompute(spark):
    out = QUERIES["x_distribution_drift"](spark, SF01).collect()
    assert out
    for r in out:
        p, q = r["weekday_share"], r["weekend_share"]
        expect = round((p - q) * math.log(p / q) * 1e6)
        assert r["psi_micronats"] == pytest.approx(expect, abs=1)
        # shares are true ratios
        assert 0 < p < 1 and 0 < q < 1


def test_psi_zero_for_identical_distributions(spark):
    # same category mix in both slices -> every PSI term is exactly 0
    rows = [(d, c) for d in ("wd", "we") for c in ("x", "y") for _ in range(5)]
    df = spark.createDataFrame(rows, ["slice", "cat"])
    a = df.groupBy("cat").agg(
        F.sum(F.when(F.col("slice") == "wd", 1).otherwise(0)).alias("p_n"),
        F.sum(F.when(F.col("slice") == "we", 1).otherwise(0)).alias("q_n"),
    )
    tot = a.agg(F.sum("p_n").alias("pt"), F.sum("q_n").alias("qt"))
    j = a.crossJoin(F.broadcast(tot))
    p = F.col("p_n") / F.col("pt")
    q = F.col("q_n") / F.col("qt")
    terms = j.select(
        F.round((p - q) * F.log(p / q) * 1e6, 0).cast("long").alias("t")
    ).collect()
    assert all(r["t"] == 0 for r in terms)


def test_event_sequences_ordered_under_shuffled_input(spark):
    # out-of-order arrival (descending ts) must not change the sequence
    rows = [
        (3, "2024-01-01 00:00:03", 7, "purchase"),
        (1, "2024-01-01 00:00:01", 7, "view"),
        (2, "2024-01-01 00:00:02", 7, "click"),
    ]
    df = (
        spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
        .withColumn("ts", F.to_timestamp("ts"))
        .repartition(3)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 12)
    out = r.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
        ).alias("seq")
    ).collect()
    assert out[0]["seq"] == "view>click>purchase"


def test_event_sequences_caps_at_12_steps(spark):
    out = QUERIES["w_event_sequences"](spark, SF01).collect()
    assert out and all(r["steps"] <= 12 for r in out)
    assert all(len(r["seq"].split(">")) == r["steps"] for r in out)


def test_cascade_delete_plan_subset_relations(spark):
    rows = {
        r["table_name"]: r["n_rows"]
        for r in QUERIES["x_cascade_delete_plan"](spark, SF01).collect()
    }
    assert set(rows) == {"customer", "orders", "lineitem"}
    # the forget set is non-empty and strictly smaller than each table
    from sportstv_streaming_data_warehouse_spark.sources.fixtures import (
        load_table,
    )

    assert 0 < rows["customer"] < load_table(spark, SF01, "customer").count()
    # orders-per-customer and lines-per-order fan out
    assert rows["orders"] >= rows["customer"] // 97  # some customers order
    assert rows["lineitem"] >= rows["orders"]  # >=1 line per order in TPC-H


def test_out_of_order_audit_semantics(spark):
    out = {r["event_day"]: r for r in QUERIES["q_out_of_order_audit"](spark, SF01).collect()}
    assert sum(r["n_events"] for r in out.values()) == 10000
    for r in out.values():
        assert 0 <= r["n_late"] <= r["n_events"]
        assert r["max_lateness_s"] >= 0
        if r["n_late"] == 0:
            assert r["max_lateness_s"] == 0
        # late_share is exactly the ratio
        assert r["late_share"] == r["n_late"] / r["n_events"]


def test_out_of_order_audit_planted_disorder(spark):
    """The fixture events are perfectly ordered, so q_out_of_order_audit
    legitimately answers all-zeros there — this planted case drives the
    SAME extracted body (operators/windows.out_of_order_stats) through
    real disorder with hand-computed truth."""
    from sportstv_streaming_data_warehouse_spark.operators.windows import (
        out_of_order_stats,
    )

    rows = [
        # seq, ts — two late rows on day 1 (180 s and 360 s behind the
        # running max), day 2 fully ordered
        (1, "2024-05-01 10:00:00"),
        (2, "2024-05-01 10:05:00"),
        (3, "2024-05-01 10:02:00"),   # late by 180 s vs seq-2
        (4, "2024-05-01 10:07:00"),
        (5, "2024-05-01 10:01:00"),   # late by 360 s vs seq-4
        (6, "2024-05-01 10:10:00"),
        (7, "2024-05-02 09:00:00"),
        (8, "2024-05-02 09:30:00"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = {r["event_day"]: r for r in out_of_order_stats(df).collect()}
    d1, d2 = got["2024-05-01"], got["2024-05-02"]
    assert d1["n_events"] == 6 and d1["n_late"] == 2
    assert d1["max_lateness_s"] == 360
    assert d1["late_share"] == 2 / 6
    assert d2["n_events"] == 2 and d2["n_late"] == 0
    assert d2["max_lateness_s"] == 0


def test_out_of_order_audit_sub_second_lateness_floors_to_zero(spark):
    # a row late by under one second: n_late counts it, but the
    # floored-seconds gap is 0 — the documented whole-second contract
    from sportstv_streaming_data_warehouse_spark.operators.windows import (
        out_of_order_stats,
    )

    rows = [
        (1, "2024-05-01 10:00:00.900"),
        (2, "2024-05-01 10:00:00.400"),  # late by 0.5 s
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    r = out_of_order_stats(df).collect()[0]
    assert r["n_late"] == 1 and r["max_lateness_s"] == 0
