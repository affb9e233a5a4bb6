"""Window-function-shaped operators.

The reference has no SQL window functions; it implements argmax and YoY
growth driver-side in R (BusinessAnalysis.PractII.VarmaA.Rmd:246-247,
440-447, 197-202). Here they are distributed window ops, so nothing but
the final small result ever reaches the driver.

Scale note: a per-group argmax is a single shuffle on the partition key
(no global sort); YoY lag over per-year totals operates on a tiny
aggregated input, so the single-partition window is safe.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def per_group_argmax(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    n: int = 1,
) -> DataFrame:
    """Top-n rows per group (report.Rmd:440-447's lapply/which.max).

    ``order_by`` should end with a unique tiebreaker so results are
    deterministic under any partitioning.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def yoy_growth(
    df: DataFrame,
    year_col: str = "year",
    value_col: str = "total",
    out_col: str = "growth_pct",
) -> DataFrame:
    """Year-over-year % growth via lag() (report.Rmd:197-202 in R)."""
    w = Window.orderBy(year_col)
    prev = F.lag(F.col(value_col)).over(w)
    return df.withColumn(
        out_col,
        (F.col(value_col) - prev) / prev * 100.0,
    )
