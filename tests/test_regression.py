"""Per-group trend: the expression path (oracle-matched) and the
applyInPandas path must agree — showing the Python escape hatch is a
choice, not a necessity, for group-wise math."""

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.operators.regression import (
    trend_apply_in_pandas,
    trend_expr,
)
from sportstv_streaming_data_warehouse_spark.sources.fixtures import load_table

from .conftest import SF001


def test_expr_and_pandas_paths_agree(spark):
    ev = load_table(spark, SF001, "events").withColumn(
        "x", (F.unix_timestamp("ts") - F.lit(1704067200)).cast("long")
    )
    a = {r["user_id"]: (r["n"], r["slope"]) for r in trend_expr(ev, "user_id", "x", "value").collect()}
    b = {r["user_id"]: (r["n"], r["slope"]) for r in trend_apply_in_pandas(ev, "user_id", "x", "value").collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == b[k][0]
        sa, sb = a[k][1], b[k][1]
        if sa is None or sb is None:
            assert sa == sb
        else:
            # polyfit solves via SVD; agreement to float tolerance
            assert abs(sa - sb) < 1e-6 * max(abs(sa), 1e-9), k


def test_known_slope(spark):
    # y = 3x + 7 exactly → slope 3
    df = spark.createDataFrame(
        [(1, x, 3.0 * x + 7.0) for x in range(10)], ["user_id", "x", "y"]
    )
    row = trend_expr(df, "user_id", "x", "y").first()
    assert abs(row["slope"] - 3.0) < 1e-12
