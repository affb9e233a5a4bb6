"""Calendar key derivation — the reference's load-bearing date semantics.

Conventions replicated exactly (SURVEY.md §1.4; all sites in
/root/reference/src/loadAnalyticsDB.PractII.VarmaA.R):

- ``date_id``  : integer yyyyMMdd                     (etl.R:76, 210)
- ``quarter``  : (month-1) %/% 3 + 1 == calendar qtr  (etl.R:79, 213)
- ``week``     : ISO-8601 week number, R's %V         (etl.R:81, 215)
- ``day_of_week``: R %w (Sun=0) + 1 → Sun=1..Sat=7    (etl.R:217)

Spark's builtins match bit-for-bit: ``weekofyear`` is ISO-8601 and
``dayofweek`` is already Sunday=1..Saturday=7, so no UDFs are needed —
every key stays inside whole-stage codegen. The ISO-week/calendar-year
pairing subtlety (week 53 rows dated Jan 1) is preserved: ``year`` is the
CALENDAR year, deliberately not the ISO year.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CALENDAR_COLS = (
    "date_id",
    "year",
    "quarter",
    "month",
    "week",
    "day_of_month",
    "day_of_week",
)


def calendar_keys(d: Column) -> dict[str, Column]:
    """All calendar keys from a date column, as native Column exprs."""
    return {
        "date_id": F.date_format(d, "yyyyMMdd").cast("int"),
        "year": F.year(d),
        "quarter": F.quarter(d),
        "month": F.month(d),
        "week": F.weekofyear(d),
        "day_of_month": F.dayofmonth(d),
        "day_of_week": F.dayofweek(d),
    }


def with_calendar_keys(df: DataFrame, date_col: str, prefix: str = "") -> DataFrame:
    d = F.to_date(F.col(date_col))
    return df.withColumns({prefix + k: c for k, c in calendar_keys(d).items()})


def date_spine(spark: SparkSession, start, end) -> DataFrame:
    """Daily calendar spine between two dates, inclusive — the dim_date
    builder (replaces R's seq(by="day") driver-side loop at etl.R:204).

    Built with sequence+explode so the spine is a distributed DataFrame;
    at one row per day it is trivially broadcastable as a dimension.
    """
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("full_date")
    )
    return spine.withColumns(calendar_keys(F.col("full_date")))


def date_spine_from_bounds(
    bounds: DataFrame, lo: str = "lo", hi: str = "hi"
) -> DataFrame:
    """Daily spine from a 1-row bounds AGGREGATE, fully lazy.

    Unlike ``date_spine(spark, lo, hi)`` with driver-side literals, this
    keeps the bounds computation inside the query plan — no eager
    ``.first()`` pass over the source before the main query runs, so a
    spine over a 100 TB fact costs one job, not two."""
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.col(lo).cast("date"),
                F.col(hi).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("full_date")
    )
    return spine.withColumns(calendar_keys(F.col("full_date")))
