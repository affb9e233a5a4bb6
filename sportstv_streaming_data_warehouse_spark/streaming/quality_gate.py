"""Streaming data-quality gate with dead-letter routing.

The batch ETL validates after loading (plans/quality.py, mirroring
etl.R:624-753); a STREAM cannot stop to inspect, so the gate runs inline:
every micro-batch row is checked against the declarative expectations,
valid rows flow into the rollup/merge pipeline (streaming/ingest.py),
and violating rows are appended to a quarantine sink WITH the names of
the rules they broke — nothing is silently dropped, and the dead-letter
table is replayable once the upstream defect is fixed.

Composed as two streaming queries over the same file source (the
idiomatic Spark shape for a fork — one sink per query, each with its own
checkpoint): the expectations compile to one array expression per row,
so the gate costs no extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.quality import Expectation
from .ingest import TXN_STREAM_SCHEMA, daily_rollup_stream, start_ingestion


def with_violations(
    df: DataFrame, expectations: list[Expectation], out_col: str = "violated_rules"
) -> DataFrame:
    """Attach the array of violated rule names (empty == row passes)."""
    arr = F.array(
        *[
            F.when(~F.coalesce(e.predicate, F.lit(False)), F.lit(e.name))
            for e in expectations
        ]
    )
    return df.withColumn(out_col, F.array_compact(arr))


def split_valid(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """(valid rows, violating rows + violated_rules) — works on batch and
    streaming DataFrames alike (pure column expressions)."""
    tagged = with_violations(df, expectations)
    good = tagged.filter(F.size("violated_rules") == 0).drop("violated_rules")
    bad = tagged.filter(F.size("violated_rules") > 0)
    return good, bad


def start_gated_ingestion(
    spark: SparkSession,
    in_path: str,
    expectations: list[Expectation],
    out_path: str,
    dlq_path: str,
    checkpoint_dir: str,
    schema=TXN_STREAM_SCHEMA,
    available_now: bool = True,
):
    """Run the gated pipeline: valid rows → windowed rollup → idempotent
    merge sink; violating rows → dead-letter parquet. Returns both
    streaming queries (rollup first)."""
    stream = spark.readStream.schema(schema).json(in_path)
    good, bad = split_valid(stream, expectations)

    rollup_q = start_ingestion(
        daily_rollup_stream(good),
        out_path,
        f"{checkpoint_dir}/rollup",
        available_now=available_now,
    )
    dlq_writer = (
        bad.writeStream.outputMode("append")
        .format("parquet")
        .option("path", dlq_path)
        .option("checkpointLocation", f"{checkpoint_dir}/dlq")
    )
    if available_now:
        dlq_writer = dlq_writer.trigger(availableNow=True)
    dlq_q = dlq_writer.start()
    return rollup_q, dlq_q
