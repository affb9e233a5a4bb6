"""JDBC source (SURVEY §1.5: the reference's SQLite/MySQL endpoints map
to ``spark.read.format("jdbc")``).

The reader plumbs every option Spark's JDBC source needs for PARALLEL
reads (partitionColumn + bounds + numPartitions — without them Spark
reads the whole table through one connection, the classic
single-threaded-ingest trap) and fails cleanly when no driver is
present.

LIVE-TESTED since round 10 (tests/test_jdbc_live.py): the sandbox
ships the Hive JDBC driver jar on Spark's classpath plus Spark's own
Thrift JDBC/ODBC server, so the full ``spark.read.format("jdbc")``
path — plain, sharded-parallel, and filter-pushdown — runs end-to-end
against a real network endpoint. Dialect note baked into that test:
Spark quotes pruned columns with double quotes, which a
Spark-SQL-backed endpoint parses as STRING LITERALS unless the session
sets ``spark.sql.ansi.doubleQuotedIdentifiers=true`` (passable through
the hive2 URL's conf list) — without it every projected column comes
back as its own name. Swapping in MySQL/Postgres needs only that
warehouse's jar and URL; their dialects quote correctly out of the
box."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    custom_schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``table`` (a table name or a ``(SELECT ...) t`` pushdown
    subquery) from a JDBC endpoint as a DataFrame.

    Pass ``partition_column`` + ``lower_bound``/``upper_bound`` to shard
    the read across ``num_partitions`` concurrent connections (defaults
    to the session's parallelism). ``custom_schema`` pins column types
    where the dialect's defaults are wrong (e.g. SQLite's dynamic types).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if driver is not None:
        reader = reader.option("driver", driver)
    if custom_schema is not None:
        reader = reader.option("customSchema", custom_schema)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option(
                "numPartitions",
                str(num_partitions or spark.sparkContext.defaultParallelism),
            )
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
