"""ETL-semantics tests against the reference-shaped fixtures: the
behaviors SURVEY.md §7.4 calls load-bearing — inference precedence, the
ISO-week-53/calendar-year pairing, retention accounting, exact distinct
counts — plus a full-pipeline DuckDB cross-check."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans import star

from .fixtures_ref import RECOVERABLE, UNRECOVERABLE, generate
from .parity import compare


@pytest.fixture(scope="module")
def data():
    return generate()


@pytest.fixture(scope="module")
def sdfs(spark, data):
    out = {}
    for name, pdf in data.items():
        out[name] = spark.createDataFrame(pdf)
    return out


@pytest.fixture(scope="module")
def etl(spark, sdfs):
    return star.run_etl(
        spark,
        streaming_txns=sdfs["streaming_txns"],
        csv_txns=sdfs["csv_txns"],
        subscribers=sdfs["subscribers"],
        postal2city=sdfs["postal2city"],
        cities=sdfs["cities"],
        countries=sdfs["countries"],
        assets=sdfs["assets"],
    )


def test_dims(etl):
    assert etl["dim_country"].count() == 6
    sports = [r["sport_name"] for r in etl["dim_sport"].orderBy("sport_id").collect()]
    # NULL/'' sport rows filtered (etl.R:176)
    assert sports == ["Ice Hockey", "Inline Hockey", "Ski Jumping"]
    dates = etl["dim_date"].agg(
        F.min("full_date").alias("lo"), F.max("full_date").alias("hi"),
        F.count("*").alias("n"),
    ).first()
    assert (dates["hi"] - dates["lo"]).days + 1 == dates["n"]


def test_inference_precedence_icehl(spark, sdfs):
    """ICEHL- matches both the ICE- (Ice Hockey) and ICEHL- (Inline
    Hockey) patterns; last-write-wins must yield Inline Hockey
    (etl.R:275-282, SURVEY §7.4.3)."""
    asset_sport = sdfs["assets"].filter(
        F.col("sport").isNotNull() & (F.col("sport") != "")
    ).select("asset_id", "sport")
    uc = star.build_user_country(
        sdfs["subscribers"], sdfs["postal2city"], sdfs["cities"]
    )
    enriched = star.enrich_transactions(
        sdfs["streaming_txns"], uc, asset_sport
    )
    got = (
        enriched.filter(F.col("asset_id").startswith("ICEHL-"))
        .select("sport").distinct().collect()
    )
    assert [r["sport"] for r in got] == ["Inline Hockey"]
    # and every recoverable prefix lands on its expected sport
    for prefix, expected in RECOVERABLE.items():
        vals = (
            enriched.filter(F.col("asset_id").startswith(f"{prefix}-"))
            .select("sport").distinct().collect()
        )
        assert [r["sport"] for r in vals] == [expected], prefix


def test_week53_calendar_year_pairing(etl):
    """2021-01-01 is ISO week 53 of 2020 but calendar year 2021; the
    fact must pair week=53 with year=2021 (etl.R:81,215 + §7.4.2)."""
    rows = etl["fact"].filter(F.col("date_id") == 20210101).select(
        "year", "week"
    ).distinct().collect()
    assert rows, "no fact rows for 2021-01-01"
    assert all(r["year"] == 2021 and r["week"] == 53 for r in rows)


def test_retention_accounting(etl, data):
    """Dropped rows must be exactly the unrecoverable-prefix orphans —
    nothing else (all users resolve to a country; report.Rmd:616-619)."""
    src = data["streaming_txns"]
    csv = data["csv_txns"]
    total = len(src) + len(csv)
    unrecoverable = sum(
        1
        for df in (src, csv)
        for a in df["asset_id"]
        if a.split("-")[0] in UNRECOVERABLE
    )
    v = star.validate_fact(etl["fact"], total)
    assert v["rows_dropped"] == unrecoverable
    assert v["week_range_ok"] and v["null_keys_ok"]
    assert v["retention_pct"] > 95.0  # reference reports 97.1%


def test_unique_users_exact(etl, sdfs):
    """unique_user_count is the EXACT per-grain distinct — not the
    reference's batch-additive approximation (§7.4.1)."""
    fact_row = (
        etl["fact"].orderBy(F.desc("transaction_count")).limit(1).first()
    )
    uc = star.build_user_country(
        sdfs["subscribers"], sdfs["postal2city"], sdfs["cities"]
    )
    asset_sport = sdfs["assets"].filter(
        F.col("sport").isNotNull() & (F.col("sport") != "")
    ).select("asset_id", "sport")
    core = ["transaction_id", "user_id", "asset_id", "streaming_date",
            "minutes_streamed", "completed"]
    txns = sdfs["streaming_txns"].select(core).unionByName(
        sdfs["csv_txns"].withColumn("completed", F.col("completed").cast("int")).select(core)
    )
    enriched = star.enrich_transactions(txns, uc, asset_sport)
    expected = (
        enriched.filter(
            (F.date_format("streaming_date", "yyyyMMdd").cast("int") == fact_row["date_id"])
            & (F.col("country_id") == fact_row["country_id"])
            & (F.col("sport") == fact_row["sport_name"])
        )
        .select("user_id").distinct().count()
    )
    assert fact_row["unique_user_count"] == expected


def test_fact_write_partition_pruning(etl, tmp_path, spark):
    """Year-partitioned parquet write: the Spark replacement for MySQL
    RANGE partitions (schema.R:160-168) — a year filter must prune."""
    path = str(tmp_path / "fact")
    star.write_fact(etl["fact"], path)
    back = spark.read.parquet(path)
    assert back.count() == etl["fact"].count()
    plan = (
        back.filter(F.col("year") == 2021)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "year" in plan
    # hive-style layout on disk: one directory per year
    import os

    partdirs = sorted(d for d in os.listdir(path) if d.startswith("year="))
    assert "year=2021" in partdirs and len(partdirs) >= 2


def test_validate_handles_empty_fact(spark):
    """All rows filtered out (e.g. no recoverable sports) must produce an
    empty fact and a non-crashing validation report."""
    empty = spark.createDataFrame(
        [],
        "transaction_id long, user_id long, asset_id string,"
        " streaming_date string, minutes_streamed int, completed int",
    )
    uc = spark.createDataFrame([(1, 1)], ["user_id", "country_id"])
    asp = spark.createDataFrame([("DEL-1", "Ice Hockey")], ["asset_id", "sport"])
    fact = star.build_fact(star.enrich_transactions(empty, uc, asp))
    assert fact.count() == 0
    v = star.validate_fact(fact, 0)
    assert v["fact_rows_represented"] == 0
    assert v["week_range_ok"] and v["null_keys_ok"]


def test_full_pipeline_duckdb_crosscheck(etl, data):
    """The entire ETL (union → snowflake → inference → filter → fill →
    rollup) recomputed in DuckDB SQL must match the Spark fact exactly."""
    con = duckdb.connect()
    for name, pdf in data.items():
        con.register(name, pdf)
    sql = """
    WITH txns AS (
      SELECT transaction_id, user_id, asset_id, streaming_date,
             minutes_streamed, completed
      FROM streaming_txns
      UNION ALL
      SELECT transaction_id, user_id, asset_id, streaming_date,
             minutes_streamed, CAST(completed AS INT) AS completed
      FROM csv_txns
    ),
    uc AS (
      SELECT DISTINCT s.user_id, c.country_id
      FROM subscribers s
      JOIN postal2city p USING (postal_code)
      JOIN cities c USING (city_id)
    ),
    ast AS (SELECT asset_id, sport FROM assets
            WHERE sport IS NOT NULL AND sport != ''),
    enr AS (
      SELECT t.user_id, CAST(t.streaming_date AS DATE) AS d, uc.country_id,
             COALESCE(ast.sport,
               CASE  -- reversed rule order == last-write-wins
                 WHEN regexp_matches(t.asset_id, '^(SKJ|SKA|FIS)-') THEN 'Ski Jumping'
                 WHEN regexp_matches(t.asset_id, '^(IHL|ICEHL)-') THEN 'Inline Hockey'
                 WHEN regexp_matches(t.asset_id, '^(DEL|AHL|AIH|IHB|SIH|NLN|NLA|ICE|NXXX|SLXXX)-') THEN 'Ice Hockey'
               END) AS sport,
             COALESCE(t.minutes_streamed, 0) AS minutes,
             COALESCE(t.completed, 0) AS completed
      FROM txns t
      LEFT JOIN uc USING (user_id)
      LEFT JOIN ast USING (asset_id)
    )
    SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_id,
           country_id, sport AS sport_name,
           COUNT(*) AS transaction_count,
           COUNT(DISTINCT user_id) AS unique_user_count,
           CAST(SUM(minutes) AS BIGINT) AS total_minutes_streamed,
           CAST(SUM(completed) AS BIGINT) AS completed_streams,
           CASE WHEN COUNT(*) > 0
                THEN CAST(SUM(minutes) AS DOUBLE) / COUNT(*) ELSE 0
           END AS avg_minutes_per_stream,
           YEAR(d) AS year, QUARTER(d) AS quarter, MONTH(d) AS month,
           week(d) AS week
    FROM enr
    WHERE country_id IS NOT NULL AND sport IS NOT NULL AND d IS NOT NULL
    GROUP BY 1, 2, 3, 9, 10, 11, 12
    """
    compare(etl["fact"], con, sql, "star_etl_fact")
    con.close()


def test_write_path_observed_bounds_equal_the_eager_scan(
    spark, sdfs, etl, tmp_path
):
    """Round-13 fusion: the write path derives the date-spine bounds
    from Observation metrics riding the fact-write action (one pass
    over the raw sources) instead of the eager min/max scan. The two
    branches must agree exactly — same dim_date range AND the same fact
    rows (the observed aggregate sees the PRE-filter union, like the
    eager scan did)."""
    written = star.run_etl(
        spark,
        streaming_txns=sdfs["streaming_txns"],
        csv_txns=sdfs["csv_txns"],
        subscribers=sdfs["subscribers"],
        postal2city=sdfs["postal2city"],
        cities=sdfs["cities"],
        countries=sdfs["countries"],
        assets=sdfs["assets"],
        out_path=str(tmp_path / "fact"),
    )
    span = lambda d: d.agg(  # noqa: E731
        F.min("full_date").alias("lo"), F.max("full_date").alias("hi"),
        F.count("*").alias("n"),
    ).first()
    assert span(written["dim_date"]) == span(etl["dim_date"])
    # align column order: the written fact is read back from a
    # partitionBy("year") layout, which appends the partition column
    cols = sorted(etl["fact"].columns)
    key = lambda df: sorted(map(str, df.select(*cols).collect()))  # noqa: E731
    assert key(written["fact"]) == key(etl["fact"])
