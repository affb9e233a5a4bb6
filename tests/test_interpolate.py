"""Planted-value tests for linear interpolation
(operators/windows.interpolate_linear): exact milli-unit ramps on
increasing, DECREASING (the floor-vs-truncate division trap), and flat
segments; per-series spines; observed cells passed through untouched."""

import datetime as dt

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.operators.windows import (
    interpolate_linear,
)


def _d(day):
    return dt.date(2024, 1, day)


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["s", "d", "v"])
    out = interpolate_linear(df, ["s"])
    return {
        (r["s"], r["d"]): (r["filled_value"], r["is_interpolated"])
        for r in out.collect()
    }


def test_increasing_and_decreasing_ramps(spark):
    got = _run(
        spark,
        [
            ("up", _d(1), 0), ("up", _d(4), 9),         # +3/day
            ("down", _d(1), 10), ("down", _d(4), 0),    # -10 over 3 days
        ],
    )
    assert got[("up", _d(2))] == (3, True)
    assert got[("up", _d(3))] == (6, True)
    # floor semantics on the decreasing segment: 10 - 10/3 ≈ 6.67 → 6,
    # 10 - 20/3 ≈ 3.33 → 3 (truncation toward zero would give 7 and 4)
    assert got[("down", _d(2))] == (6, True)
    assert got[("down", _d(3))] == (3, True)


def test_observed_cells_untouched_and_span_bounds(spark):
    got = _run(
        spark,
        [("a", _d(3), 5), ("a", _d(5), 7), ("b", _d(10), 1)],
    )
    # per-series span: no rows outside [min, max] of each series
    assert set(got) == {
        ("a", _d(3)), ("a", _d(4)), ("a", _d(5)), ("b", _d(10)),
    }
    assert got[("a", _d(3))] == (5, False)
    assert got[("a", _d(4))] == (6, True)
    assert got[("a", _d(5))] == (7, False)
    assert got[("b", _d(10))] == (1, False)


def test_flat_and_negative_values(spark):
    got = _run(
        spark,
        [("f", _d(1), -4), ("f", _d(3), -4), ("n", _d(1), -9), ("n", _d(4), 0)],
    )
    assert got[("f", _d(2))] == (-4, True)
    # -9 → 0 over 3 days: -9 + 3 = -6, -9 + 6 = -3 (exact thirds)
    assert got[("n", _d(2))] == (-6, True)
    assert got[("n", _d(3))] == (-3, True)


def test_single_shuffle_plan(spark):
    df = spark.createDataFrame(
        [("a", _d(1), 0), ("a", _d(9), 8)], ["s", "d", "v"]
    )
    plan = (
        interpolate_linear(df, ["s"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
