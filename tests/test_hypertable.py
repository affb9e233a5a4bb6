"""Multi-grain rollup hierarchy: additive metrics re-aggregate exactly
from the finer fact; distinct counts must NOT (the reference's
double-count, demonstrated), and the raw-grain recompute is exact."""

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans import hypertable, star

from .fixtures_ref import generate


def _setup(spark):
    data = {k: spark.createDataFrame(v) for k, v in generate(4000, 500).items()}
    uc = star.build_user_country(
        data["subscribers"], data["postal2city"], data["cities"]
    )
    asp = data["assets"].filter(
        F.col("sport").isNotNull() & (F.col("sport") != "")
    ).select("asset_id", "sport")
    core = ["transaction_id", "user_id", "asset_id", "streaming_date",
            "minutes_streamed", "completed"]
    txns = data["streaming_txns"].select(core).unionByName(
        data["csv_txns"].withColumn("completed", F.col("completed").cast("int")).select(core)
    )
    enriched = star.enrich_transactions(txns, uc, asp)
    return enriched, star.build_fact(enriched)


def test_additive_rollup_matches_raw(spark):
    enriched, daily = _setup(spark)
    h = hypertable.build_hierarchy(daily, enriched)
    from_raw = (
        enriched.withColumn("year", F.year("streaming_date"))
        .withColumn("month", F.month("streaming_date"))
        .groupBy("year", "month", "country_id", F.col("sport").alias("sport_name"))
        .agg(
            F.count("*").cast("long").alias("transaction_count"),
            F.sum("minutes_streamed").cast("long").alias("total_minutes_streamed"),
        )
    )
    a = {
        (r["year"], r["month"], r["country_id"], r["sport_name"]):
            (r["transaction_count"], r["total_minutes_streamed"])
        for r in h["monthly"].collect()
    }
    b = {
        (r["year"], r["month"], r["country_id"], r["sport_name"]):
            (r["transaction_count"], r["total_minutes_streamed"])
        for r in from_raw.collect()
    }
    assert a == b


def test_distinct_counts_do_not_compose(spark):
    """Summing daily uniques over a month must OVERCOUNT the true monthly
    distinct somewhere (users active on multiple days) — the reference's
    approximation made visible — while the raw-grain recompute is exact."""
    enriched, daily = _setup(spark)
    h = hypertable.build_hierarchy(daily, enriched)

    naive = (
        daily.groupBy("year", "month", "country_id", "sport_name")
        .agg(F.sum("unique_user_count").alias("summed_daily_uniques"))
    )
    joined = h["monthly"].join(
        naive, ["year", "month", "country_id", "sport_name"]
    )
    rows = joined.collect()
    assert all(r["summed_daily_uniques"] >= r["unique_user_count"] for r in rows)
    assert any(r["summed_daily_uniques"] > r["unique_user_count"] for r in rows), (
        "fixture should contain users active on multiple days in a month"
    )

    # exactness of the raw recompute, spot-checked against a direct query
    top = h["monthly"].orderBy(F.desc("transaction_count")).first()
    direct = (
        enriched.filter(
            (F.year("streaming_date") == top["year"])
            & (F.month("streaming_date") == top["month"])
            & (F.col("country_id") == top["country_id"])
            & (F.col("sport") == top["sport_name"])
        )
        .select("user_id").distinct().count()
    )
    assert top["unique_user_count"] == direct
