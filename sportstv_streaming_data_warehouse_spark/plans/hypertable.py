"""Multi-grain rollup hierarchy (hypertable-style continuous aggregates):
daily → monthly → yearly facts maintained together.

The load-bearing subtlety (the one the reference trips on, SURVEY §7.4.1):
ADDITIVE metrics (counts, sums) re-aggregate exactly from the next-finer
grain — the monthly fact is a cheap rollup of the daily fact, never
touching raw data. DISTINCT counts do NOT compose: summing daily
unique_user_count over a month double-counts users active on several
days, which is precisely the reference's documented approximation
(report.Rmd:662). Coarser-grain distincts therefore recompute from the
raw grain (or use mergeable HLL sketches via approx_count_distinct).

Cost at 100 TB: the daily fact is the only aggregation that reads raw
data for additive metrics; each coarser grain reads the (tiny) finer
fact. Distinct recomputes read raw once per grain — the price of
exactness, with HLL as the documented cheaper alternative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ADDITIVE = ["transaction_count", "total_minutes_streamed", "completed_streams"]


def rollup_to(
    finer: DataFrame, keys: list[str], additive_cols: list[str] = ADDITIVE
) -> DataFrame:
    """Re-aggregate ADDITIVE metrics from a finer-grain fact — exact, and
    reads only the small fact."""
    return finer.groupBy(*keys).agg(
        *[F.sum(c).cast("long").alias(c) for c in additive_cols]
    )


def distinct_at(
    raw_enriched: DataFrame, keys: list[str], user_col: str = "user_id"
) -> DataFrame:
    """Exact distinct users at an arbitrary grain — must come from raw
    (per-day distincts cannot be merged)."""
    return raw_enriched.groupBy(*keys).agg(
        F.countDistinct(user_col).alias("unique_user_count")
    )


def build_hierarchy(daily_fact: DataFrame, raw_enriched: DataFrame) -> dict[str, DataFrame]:
    """daily (given) → monthly → yearly, additive from the finer fact,
    exact distincts from raw, joined per grain."""
    raw = raw_enriched.withColumn("year", F.year("streaming_date")).withColumn(
        "month", F.month("streaming_date")
    )
    monthly = rollup_to(daily_fact, ["year", "month", "country_id", "sport_name"]).join(
        distinct_at(raw, ["year", "month", "country_id", "sport"]).withColumnRenamed(
            "sport", "sport_name"
        ),
        ["year", "month", "country_id", "sport_name"],
        "left",
    )
    yearly = rollup_to(daily_fact, ["year", "country_id", "sport_name"]).join(
        distinct_at(raw, ["year", "country_id", "sport"]).withColumnRenamed(
            "sport", "sport_name"
        ),
        ["year", "country_id", "sport_name"],
        "left",
    )
    return {"daily": daily_fact, "monthly": monthly, "yearly": yearly}
