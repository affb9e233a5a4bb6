"""Streaming quantile-sketch rollup — the streaming twin of the batch
``h_sketch_rollup_quantile`` catalog query (operators/sketches.py
log-bucket DDSketch-family histograms).

Because the sketch is PURELY ADDITIVE — a weekly sketch is just
(event_type, week, bucket) → count, merged by adding counts — the
streaming twin needs no custom state operator at all: it is a native
watermarked window aggregation (``groupBy(event_type, window(ts, '7
days'), bucket).count()``), which Structured Streaming executes with
map-side partial aggregation and per-key incremental state. That is
the whole point of choosing a mergeable sketch for the rollup tier:
the SAME algebra serves batch re-aggregation (day → week → month),
incremental MERGE upserts, and streaming, with bit-identical results.

Append mode emits each (event_type, wk, bucket, c) row exactly once,
when the watermark passes its week's end — finalized weekly sketches
flow downstream as tiny mergeable rows (O(octaves×16) per group,
regardless of event volume), where ``quantiles_from_sketch`` (or any
batch re-merge) extracts p50/p95 with the sketch's ≤1/32
relative-error contract.

Epoch alignment: ``F.window(ts, "7 days")`` tumbles from the epoch
origin 1970-01-01, so the derived week id ``datediff(window.start,
1970-01-01) / 7`` equals the batch query's ``floor(epoch_day / 7)``
exactly — parity is row-identical, not just distribution-identical.

Scale posture: one shuffle on (event_type, week-window, bucket);
streaming state is one count per live (type, week, bucket) triple —
bounded by types × weeks-inside-watermark × buckets, never by event
volume. No Python state function: the whole pipeline is JVM-side
codegen.

Parity (tests/test_stream_qsketch.py): streamed weekly sketch rows are
bit-equal to the batch groupBy under out-of-order multi-drop arrival,
and quantiles extracted from the streamed sketch equal the batch
catalog query's estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType
from pyspark.sql.window import Window

from ..operators.sketches import qsketch_bucket, qsketch_bucket_estimate

EPOCH = "1970-01-01"


def qsketch_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    delay: str = "1 day",
) -> DataFrame:
    """stream(ts, event_type, value) → append-mode finalized weekly
    sketch rows (event_type, wk, bucket, c), one per (type, week,
    bucket) once the watermark passes the week's end."""
    m = (F.col(value_col).cast(DecimalType(18, 3)) * 1000).cast("long")
    return (
        stream.withWatermark(ts_col, delay)
        .groupBy(
            F.col(type_col),
            F.window(ts_col, "7 days").alias("w"),
            qsketch_bucket(m).alias("bucket"),
        )
        .agg(F.count("*").alias("c"))
        .select(
            type_col,
            F.floor(
                F.datediff(F.col("w.start").cast("date"), F.lit(EPOCH).cast("date")) / 7
            )
            .cast("long")
            .alias("wk"),
            "bucket",
            "c",
        )
    )


def quantiles_from_sketch(sketch: DataFrame) -> DataFrame:
    """Batch-side quantile extraction over (event_type, wk, bucket, c)
    sketch rows — the identical cum-count rank selection the batch
    catalog query runs, reusable over any re-merge grain (re-group the
    sketch by month and the same extraction yields monthly quantiles
    without touching raw data)."""
    w_cum = (
        Window.partitionBy("event_type", "wk")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type", "wk")
    est = (
        sketch.withColumn("cum", F.sum("c").over(w_cum))
        .withColumn("n", F.sum("c").over(w_all))
        .withColumn("est", qsketch_bucket_estimate(F.col("bucket")))
    )
    r50 = F.floor((F.col("n") + 1) / 2)
    r95 = F.floor((95 * F.col("n") + 99) / 100)
    return est.groupBy("event_type", "wk").agg(
        F.min("n").alias("n"),
        F.min(F.when(F.col("cum") >= r50, F.col("est"))).alias(
            "p50_est_milli"
        ),
        F.min(F.when(F.col("cum") >= r95, F.col("est"))).alias(
            "p95_est_milli"
        ),
    )
