"""Data layout for scan skipping — the Spark-native replacement for the
reference's 13 secondary indexes (SURVEY.md §4: 'Parquet min/max
row-group skipping + optional Z-ORDER approximates it').

Parquet readers skip whole files/row-groups whose column min/max don't
intersect the predicate. That only helps if the data is CLUSTERED so
each file covers a narrow value range:

- cluster_by_range: range-repartition + in-partition sort on the filter
  columns. Optimal for one dominant filter dimension (e.g. date).
- zorder_by: interleaves the quantized bits of several columns into one
  sort key, so EVERY listed dimension's per-file span shrinks (~sqrt for
  two dims) — the multi-dimensional trade-off Delta's Z-ORDER makes,
  built from plain column expressions.

At 100 TB this is the difference between scanning every file for a
point-ish predicate and touching a handful.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cluster_by_range(df: DataFrame, cols: list[str], num_files: int = 32) -> DataFrame:
    """Range-cluster so each output file covers a narrow span of ``cols``.

    Write the result with ``.write.parquet(...)`` — one file per
    partition, each with tight min/max stats on the leading column.
    """
    return df.repartitionByRange(num_files, *cols).sortWithinPartitions(*cols)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """Morton (Z-order) key: quantize each column to ``bits`` levels over
    its observed min/max, then interleave the bits.

    Stats are collected once (one tiny job); the key itself is a pure
    column expression.
    """
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"max_{c}") for c in cols],
    ).first()

    levels = (1 << bits) - 1
    quantized = []
    for c in cols:
        lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
        span = (hi - lo) or 1.0
        q = F.least(
            F.lit(levels),
            F.greatest(
                F.lit(0),
                ((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * levels).cast("long"),
            ),
        )
        quantized.append(q)

    key = F.lit(0).cast("long")
    for bit in range(bits):
        for i, q in enumerate(quantized):
            src = F.shiftright(q, bit).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(src, bit * len(cols) + i))
    return key


def zorder_by(df: DataFrame, cols: list[str], num_files: int = 32, bits: int = 12) -> DataFrame:
    """Cluster by the interleaved Z-key so every listed column's per-file
    min/max span shrinks — ready to write as skipping-friendly parquet."""
    with_key = df.withColumn("__zkey", zorder_key(df, cols, bits))
    return (
        with_key.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )


def compact(spark, path: str, target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Compact a small-files dataset (e.g. a streaming sink that accreted
    one file per micro-batch) into ~target-sized files, atomically.

    Returns the new file count. Reads once, coalesces (no shuffle),
    writes to a staging dir, swaps. The streaming-sink counterpart of
    Delta's OPTIMIZE.

    Crash-safe: starts with the same recovery preamble as
    streaming.ingest._merge_batch — if a prior run died mid-swap, the
    dataset dir is restored from the complete staging copy (_SUCCESS
    present) or the retired copy before compacting. The rename-aside swap
    itself never deletes the only copy.

    Local-filesystem paths only (os.rename / shutil semantics). On an
    object store, compaction belongs to the table format (Delta OPTIMIZE,
    Iceberg rewrite_data_files) — this is the sandbox stand-in.
    """
    import glob
    import math
    import os
    import shutil

    base = path.rstrip("/")
    staging = base + "__compacting"
    retired = base + "__old"
    # Recovery preamble: a crash between the two renames below leaves the
    # dataset dir absent — restore from whichever complete copy exists.
    if not os.path.isdir(base):
        if os.path.isdir(staging) and os.path.exists(
            os.path.join(staging, "_SUCCESS")
        ):
            os.rename(staging, base)
        elif os.path.isdir(retired):
            os.rename(retired, base)
    shutil.rmtree(retired, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)

    files = glob.glob(f"{base}/*.parquet")
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    if n_out >= len(files):
        return len(files)  # nothing to gain

    df = spark.read.parquet(base)
    df.coalesce(n_out).write.mode("overwrite").parquet(staging)
    # Rename-aside swap: the dataset dir is never the only copy being
    # deleted; a crash at any point leaves a complete staging or retired
    # copy that the preamble above restores on the next call.
    os.rename(base, retired)
    os.rename(staging, base)
    shutil.rmtree(retired, ignore_errors=True)
    return len(glob.glob(f"{base}/*.parquet"))
