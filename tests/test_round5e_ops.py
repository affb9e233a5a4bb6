"""Semantics tests for the round-5 fifth-batch operators: Z-order layout
audit (morton interleave + zone-map touch counting on planted grids) and
per-session feature extraction (planted session shapes)."""

import datetime

from pyspark.sql import Window
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans.catalog import QUERIES

from .conftest import SF01


def _morton_py(md, pk):
    out = 0
    for i in range(8):
        out |= ((md >> i) & 1) << (2 * i)
        out |= ((pk >> i) & 1) << (2 * i + 1)
    return out


def test_morton_column_matches_python(spark):
    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, ["md", "pk"])
    morton = F.lit(0)
    for i in range(8):
        morton = morton + F.shiftleft(
            F.shiftright(F.col("md"), i).bitwiseAND(F.lit(1)), 2 * i
        ) + F.shiftleft(
            F.shiftright(F.col("pk"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    got = {(r["md"], r["pk"]): r["m"] for r in df.select("md", "pk", morton.alias("m")).collect()}
    for a, b in rows:
        assert got[(a, b)] == _morton_py(a, b)
    # bijective over the 8x8 grid
    assert len(set(got.values())) == len(rows)


def test_zorder_catalog_tradeoff_shape(spark):
    out = {r["strategy"]: r for r in QUERIES["x_zorder_layout_audit"](spark, SF01).collect()}
    assert set(out) == {"time", "part", "morton"}
    nf = out["time"]["n_files"]
    assert out["part"]["n_files"] == nf and out["morton"]["n_files"] == nf
    # single-dimension sorts win their own dimension...
    assert out["time"]["avg_files_touched_month"] < out["morton"]["avg_files_touched_month"]
    assert out["part"]["avg_files_touched_part"] < out["morton"]["avg_files_touched_part"]
    # ...and forfeit the other (≈ all files touched); morton beats both
    # on their weak axis
    assert out["time"]["avg_files_touched_part"] > 0.9 * nf
    assert out["part"]["avg_files_touched_month"] > 0.9 * nf
    assert out["morton"]["avg_files_touched_part"] < out["time"]["avg_files_touched_part"]
    assert out["morton"]["avg_files_touched_month"] < out["part"]["avg_files_touched_month"]


def _session_features(spark, rows):
    from sportstv_streaming_data_warehouse_spark.operators.windows import (
        with_session_ids,
    )

    ev = spark.createDataFrame(
        rows, ["user_id", "event_id", "event_type", "ts"]
    )
    return {
        (r["user_id"], r["session_id"]): r
        for r in with_session_ids(ev)
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_event_types"),
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias(
                "duration_us"
            ),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).cast("long").alias("n_purchases"),
        )
        .collect()
    }


def test_session_features_planted_sessions(spark):
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def at(mins):
        return t0 + datetime.timedelta(minutes=mins)

    out = _session_features(
        spark,
        [
            # user 1, session 1: view→click→purchase inside 30-min gaps
            (1, 1, "view", at(0)),
            (1, 2, "click", at(10)),
            (1, 3, "purchase", at(20)),
            # user 1, session 2: exactly 31 min after -> new session
            (1, 4, "view", at(51)),
            # user 2: single event
            (2, 5, "error", at(0)),
        ],
    )
    s1 = out[(1, 1)]
    assert s1["n_events"] == 3 and s1["n_event_types"] == 3
    assert s1["duration_us"] == 20 * 60 * 1_000_000
    assert s1["n_purchases"] == 1
    s2 = out[(1, 2)]
    assert s2["n_events"] == 1 and s2["duration_us"] == 0 and s2["n_purchases"] == 0
    assert out[(2, 1)]["n_events"] == 1


def test_session_features_boundary_exactly_30min(spark):
    # gap of exactly 1800s does NOT split (strictly-greater contract,
    # matching w_sessionize)
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 1, "view", t0),
        (1, 2, "view", t0 + datetime.timedelta(seconds=1800)),
        (1, 3, "view", t0 + datetime.timedelta(seconds=1800 + 1801)),
    ]
    out = _session_features(spark, rows)
    assert (1, 1) in out and out[(1, 1)]["n_events"] == 2
    assert (1, 2) in out and out[(1, 2)]["n_events"] == 1


def test_session_features_catalog_consistent_with_sessionize(spark):
    # session counts per user must agree with w_sessionize's rollup
    feats = QUERIES["x_session_features"](spark, SF01)
    per_user = feats.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )
    sess = QUERIES["w_sessionize"](spark, SF01)
    joined = per_user.alias("a").join(sess.alias("b"), "user_id")
    bad = joined.filter(
        (F.col("a.n_sessions") != F.col("b.n_sessions"))
        | (F.col("a.n_events") != F.col("b.n_events"))
    ).count()
    assert bad == 0
