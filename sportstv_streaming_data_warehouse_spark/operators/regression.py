"""Per-group linear trend — in two interchangeable forms:

- ``trend_expr``: closed-form least-squares slope from exact decimal
  sums, pure column expressions (whole-stage codegen, deterministic —
  this is the oracle-matched path).
- ``trend_apply_in_pandas``: the same computation as a grouped
  ``applyInPandas`` — the batch per-group escape hatch (SURVEY §2.11)
  for group-wise logic that genuinely needs numpy/scipy. Tests pin the
  two paths to each other, demonstrating when the UDF path is and isn't
  warranted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

TREND_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n", LongType()),
        StructField("slope", DoubleType()),
    ]
)


def trend_expr(df: DataFrame, key: str, x: str, y: str) -> DataFrame:
    """slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), all sums exact
    (integer x, decimal-accumulated y) so the final double arithmetic is
    bit-deterministic across engines."""
    xc = F.col(x).cast("long")
    yc = F.col(y).cast("decimal(18,2)")
    agg = df.groupBy(key).agg(
        F.count("*").alias("n"),
        F.sum(xc).alias("sx"),
        F.sum(yc).cast("double").alias("sy"),
        F.sum(xc * xc).alias("sxx"),
        # decimal(19,0) x decimal(18,2) -> precision 38, scale 2: exact in
        # both Spark and DuckDB (a wider x operand would exceed precision
        # 38 and round engine-specifically)
        F.sum(xc.cast("decimal(19,0)") * yc).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    denom = n * F.col("sxx").cast("double") - sx * sx
    slope = F.when(denom != 0, (n * F.col("sxy") - sx * F.col("sy")) / denom)
    return agg.select(F.col(key), "n", slope.alias("slope"))


def trend_apply_in_pandas(df: DataFrame, key: str, x: str, y: str) -> DataFrame:
    """Same trend via grouped applyInPandas (numpy lstsq per group).
    Self-contained closure — executors need no package import."""

    def fn(pdf):
        import numpy as _np
        import pandas as _pd

        xs = pdf[x].to_numpy(dtype=float)
        ys = pdf[y].to_numpy(dtype=float)
        n = len(xs)
        if n < 2 or _np.ptp(xs) == 0:
            slope = None
        else:
            slope = float(_np.polyfit(xs, ys, 1)[0])
        return _pd.DataFrame({"user_id": [pdf[key].iloc[0]], "n": [n], "slope": [slope]})

    return df.groupBy(key).applyInPandas(fn, TREND_SCHEMA)
