"""The reference's BusinessAnalysis report tables, Spark-side.

README.md:208-235 publishes three headline tables from the analytics
datamart — streaming-by-sport, top-markets-by-volume (with market
share), and year-over-year growth; report.Rmd builds them with R/dplyr
over the MySQL fact. Here each is one declarative aggregation over the
star fact (plans/star.py), distributed end-to-end; the display-layer
formatting (SURVEY §2.8 F13) is applied only at the very edge via
``formatted=True`` so the numeric tables stay comparable/joinable.

tests/test_report.py pins the structural invariants the reference
documents: shares sum to 100%, only countries with subscribers appear,
every recovered sport is present, and YoY growth follows the
(cur-prev)/prev formula with a NULL first year.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ..functions.display import format_display, format_pct


def _dsum(col: str):
    return F.sum(F.col(col).cast(DecimalType(18, 2))).cast("double")


def streaming_by_sport(fact: DataFrame, formatted: bool = False) -> DataFrame:
    """README:211-216: per-sport streams, hours, average duration."""
    out = (
        fact.groupBy("sport_name")
        .agg(
            F.sum("transaction_count").cast("long").alias("total_streams"),
            (_dsum("total_minutes_streamed") / 60.0).alias("total_hours"),
        )
        .withColumn(
            "avg_duration_min",
            _col_div(F.col("total_hours") * 60.0, F.col("total_streams")),
        )
        .orderBy(F.desc("total_streams"), F.asc("sport_name"))
    )
    if formatted:
        out = out.select(
            "sport_name",
            format_display(F.col("total_streams")).alias("total_streams"),
            format_display(F.col("total_hours")).alias("total_hours"),
            format_display(F.col("avg_duration_min"), 1).alias("avg_duration_min"),
        )
    return out


def top_markets(fact: DataFrame, formatted: bool = False) -> DataFrame:
    """README:218-225: per-country volume with market share of total."""
    per_country = fact.groupBy("country_id").agg(
        F.sum("transaction_count").cast("long").alias("total_streams")
    )
    w = Window.partitionBy()
    out = per_country.withColumn(
        "market_share",
        F.col("total_streams") / F.sum("total_streams").over(w),
    ).orderBy(F.desc("total_streams"), F.asc("country_id"))
    if formatted:
        out = out.select(
            "country_id",
            format_display(F.col("total_streams")).alias("total_streams"),
            format_pct(F.col("market_share")).alias("market_share"),
        )
    return out


def yoy_growth(fact: DataFrame, formatted: bool = False) -> DataFrame:
    """README:227-234: per-year transactions with (cur-prev)/prev growth;
    the first year has no prior and reports NULL."""
    yearly = fact.groupBy("year").agg(
        F.sum("transaction_count").cast("long").alias("transactions")
    )
    w = Window.partitionBy().orderBy("year")
    prev = F.lag("transactions").over(w)
    out = yearly.withColumn(
        "yoy_growth", (F.col("transactions") - prev) / prev
    ).orderBy("year")
    if formatted:
        out = out.select(
            "year",
            format_display(F.col("transactions")).alias("transactions"),
            F.coalesce(format_pct(F.col("yoy_growth")), F.lit("-")).alias(
                "yoy_growth"
            ),
        )
    return out


def _col_div(num, den):
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def business_report(fact: DataFrame, formatted: bool = True) -> dict[str, DataFrame]:
    """The full report — the Spark twin of rendering report.Rmd."""
    return {
        "streaming_by_sport": streaming_by_sport(fact, formatted),
        "top_markets": top_markets(fact, formatted),
        "yoy_growth": yoy_growth(fact, formatted),
    }
