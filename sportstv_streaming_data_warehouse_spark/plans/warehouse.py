"""Warehouse DDL + catalog operations (SURVEY.md §2.1 S6-S12).

The reference's schema script (createStarSchema.PractII.VarmaA.R) drops
and recreates the MySQL star schema (DROP loop schema.R:44-58, DDL
71-171) and verifies it via INFORMATION_SCHEMA probes (180-250). Here the
same lifecycle is Spark SQL DDL against the session catalog: managed
parquet tables, the fact partitioned by year (replacing MySQL RANGE
partitions), and introspection through ``spark.catalog`` /
``SHOW PARTITIONS``. MySQL's 13 secondary indexes have no Spark
equivalent — partition pruning + parquet min/max row-group skipping fill
that role (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

STAR_TABLES = ("dim_date", "dim_country", "dim_sport", "fact_streaming_summary")

_DDL = {
    # dim_date: schema.R:71-87 (date_id yyyyMMdd int PK-equivalent)
    "dim_date": """
        CREATE TABLE IF NOT EXISTS {db}.dim_date (
            date_id INT NOT NULL,
            full_date DATE NOT NULL,
            year INT NOT NULL, quarter INT NOT NULL, month INT NOT NULL,
            week INT NOT NULL, day_of_month INT NOT NULL,
            day_of_week INT NOT NULL
        ) USING PARQUET
    """,
    # dim_country: schema.R:95-101
    "dim_country": """
        CREATE TABLE IF NOT EXISTS {db}.dim_country (
            country_id INT NOT NULL,
            country_name STRING
        ) USING PARQUET
    """,
    # dim_sport: schema.R:109-115 (sport_id surrogate; never a fact FK)
    "dim_sport": """
        CREATE TABLE IF NOT EXISTS {db}.dim_sport (
            sport_id INT NOT NULL,
            sport_name STRING NOT NULL
        ) USING PARQUET
    """,
    # fact: schema.R:132-169 — year partitioning replaces RANGE(date_id)
    "fact_streaming_summary": """
        CREATE TABLE IF NOT EXISTS {db}.fact_streaming_summary (
            date_id INT NOT NULL,
            country_id INT NOT NULL,
            sport_name STRING NOT NULL,
            transaction_count BIGINT NOT NULL,
            unique_user_count BIGINT NOT NULL,
            total_minutes_streamed BIGINT NOT NULL,
            completed_streams BIGINT NOT NULL,
            avg_minutes_per_stream DOUBLE NOT NULL,
            quarter INT NOT NULL, month INT NOT NULL, week INT NOT NULL,
            year INT NOT NULL
        ) USING PARQUET
        PARTITIONED BY (year)
    """,
}


def create_star_schema(spark: SparkSession, db: str = "sportstv") -> None:
    """S6: idempotent CREATE of the full star schema."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for table in STAR_TABLES:
        spark.sql(_DDL[table].format(db=db))


def drop_star_schema(spark: SparkSession, db: str = "sportstv") -> None:
    """S7: idempotent teardown loop (schema.R:44-58)."""
    for table in STAR_TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {db}.{table}")
    spark.sql(f"DROP DATABASE IF EXISTS {db}")


def load_star(spark: SparkSession, etl_result: dict[str, DataFrame], db: str = "sportstv") -> None:
    """S8+S9: truncate-and-reload — overwrite inserts into the managed
    tables (replaces DELETE + 500-row bulk INSERTs, etl.R:144, 388)."""
    etl_result["dim_date"].select(
        "date_id", "full_date", "year", "quarter", "month", "week",
        "day_of_month", "day_of_week",
    ).write.insertInto(f"{db}.dim_date", overwrite=True)
    etl_result["dim_country"].write.insertInto(f"{db}.dim_country", overwrite=True)
    etl_result["dim_sport"].write.insertInto(f"{db}.dim_sport", overwrite=True)
    # insertInto is positional: order columns to the DDL (partition col last)
    etl_result["fact"].select(
        "date_id", "country_id", "sport_name", "transaction_count",
        "unique_user_count", "total_minutes_streamed", "completed_streams",
        "avg_minutes_per_stream", "quarter", "month", "week", "year",
    ).write.insertInto(f"{db}.fact_streaming_summary", overwrite=True)


def describe_warehouse(spark: SparkSession, db: str = "sportstv") -> dict:
    """S12: catalog introspection (the Spark equivalent of the
    INFORMATION_SCHEMA / SHOW INDEX probes at schema.R:180-250)."""
    # listTables(db) also returns session-global TEMP views; only the
    # managed tables belong to the warehouse
    tables = [t.name for t in spark.catalog.listTables(db) if not t.isTemporary]
    out: dict = {"database": db, "tables": {}}
    for t in sorted(tables):
        cols = [
            {"name": c.name, "type": c.dataType, "partition": c.isPartition}
            for c in spark.catalog.listColumns(f"{db}.{t}")
        ]
        info: dict = {"columns": cols}
        if any(c["partition"] for c in cols):
            info["partitions"] = [
                r[0] for r in spark.sql(f"SHOW PARTITIONS {db}.{t}").collect()
            ]
        out["tables"][t] = info
    return out
