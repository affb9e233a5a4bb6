"""Warehouse lifecycle tests: DDL create, insertInto load, catalog
introspection, partition pruning on the managed fact, idempotent drop —
the createStarSchema entry point (SURVEY.md §3.1) end to end."""

import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans import star, warehouse

from .fixtures_ref import generate

DB = "sportstv_test"


@pytest.fixture(scope="module")
def loaded(spark):
    data = {k: spark.createDataFrame(v) for k, v in generate(2000, 500).items()}
    etl = star.run_etl(
        spark,
        streaming_txns=data["streaming_txns"],
        csv_txns=data["csv_txns"],
        subscribers=data["subscribers"],
        postal2city=data["postal2city"],
        cities=data["cities"],
        countries=data["countries"],
        assets=data["assets"],
    )
    warehouse.drop_star_schema(spark, DB)
    warehouse.create_star_schema(spark, DB)
    warehouse.load_star(spark, etl, DB)
    yield etl
    warehouse.drop_star_schema(spark, DB)


def test_tables_exist_and_match(spark, loaded):
    desc = warehouse.describe_warehouse(spark, DB)
    assert set(desc["tables"]) == set(warehouse.STAR_TABLES), desc
    fact_sql = spark.table(f"{DB}.fact_streaming_summary")
    assert fact_sql.count() == loaded["fact"].count()
    # values round-trip through the managed table
    a = sorted(map(str, loaded["fact"].collect()))
    b = sorted(
        map(
            str,
            fact_sql.select(*loaded["fact"].columns).collect(),
        )
    )
    assert a == b


def test_fact_partitions_registered(spark, loaded):
    desc = warehouse.describe_warehouse(spark, DB)
    parts = desc["tables"]["fact_streaming_summary"]["partitions"]
    assert any("year=2021" in p for p in parts)
    plan = (
        spark.table(f"{DB}.fact_streaming_summary")
        .filter(F.col("year") == 2021)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan


def test_sql_queries_on_warehouse(spark, loaded):
    # the analytics catalog runs as plain SQL against the managed tables
    top = spark.sql(
        f"""
        SELECT c.country_name, SUM(f.transaction_count) AS txns
        FROM {DB}.fact_streaming_summary f
        JOIN {DB}.dim_country c ON f.country_id = c.country_id
        GROUP BY 1 ORDER BY txns DESC, country_name LIMIT 3
        """
    ).collect()
    assert len(top) == 3 and top[0]["txns"] > 0


def test_reload_is_idempotent(spark, loaded):
    before = spark.table(f"{DB}.fact_streaming_summary").count()
    warehouse.load_star(spark, loaded, DB)
    assert spark.table(f"{DB}.fact_streaming_summary").count() == before


def test_drop_create_cycle(spark):
    warehouse.drop_star_schema(spark, "cycle_db")
    warehouse.create_star_schema(spark, "cycle_db")
    warehouse.create_star_schema(spark, "cycle_db")  # idempotent
    assert set(
        t.name for t in spark.catalog.listTables("cycle_db") if not t.isTemporary
    ) == set(warehouse.STAR_TABLES)
    warehouse.drop_star_schema(spark, "cycle_db")
    warehouse.drop_star_schema(spark, "cycle_db")  # idempotent
    assert not any(
        d.name == "cycle_db" for d in spark.catalog.listDatabases()
    )


def test_drop_create_cycle_ignores_temp_views(spark):
    # a session-global temp view (e.g. a memory-sink stream) must not
    # appear as a warehouse table
    spark.range(1).createOrReplaceTempView("stray_temp_view")
    try:
        warehouse.create_star_schema(spark, "cycle_db2")
        desc = warehouse.describe_warehouse(spark, "cycle_db2")
        assert set(desc["tables"]) == set(warehouse.STAR_TABLES)
    finally:
        spark.catalog.dropTempView("stray_temp_view")
        warehouse.drop_star_schema(spark, "cycle_db2")
