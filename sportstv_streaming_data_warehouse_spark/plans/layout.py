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


def compaction_plan(
    spark, table_dir: str, target_bytes: int = 128 << 20
) -> DataFrame:
    """Small-file compaction planner: bin the data files of a table
    directory into ~``target_bytes`` merge groups.

    The small-files problem is THE silent scan killer at 100 TB — a
    table written by a 10K-task job carries 10K files, and every scan
    pays per-file open/footer costs plus a scheduler task per file.
    This audit lists the table's data files (metadata only — the local
    listing stands in for the catalog/FS listing a cluster deployment
    reads; no data is scanned) and assigns each file a compaction bin
    by its EXCLUSIVE cumulative-size prefix, the same deterministic
    first-fit contract as x_pack_shards: a file lands in the bin where
    its prefix sum falls, so bins fill to ~target_bytes in name order
    and the plan is reproducible run-over-run.

    Output: (file_name, bytes, bin, files_in_bin, bin_bytes) — one row
    per file plus the per-bin rollup columns a compaction job consumes.
    Reference anchor: the reference's MySQL tier has no file layout (a
    server owns storage); this is the lakehouse-side operation OPTIMIZE
    / bin-packing compaction re-expressed on the two-phase prefix-sum
    primitive (operators/ranking.with_running_total — no
    single-partition window even over a million-file listing).
    """
    import os

    names = sorted(
        n
        for n in os.listdir(table_dir)
        if n.endswith(".parquet") and not n.startswith("_")
    )
    listing = [
        (i, n, os.path.getsize(os.path.join(table_dir, n)))
        for i, n in enumerate(names)
    ]
    # numeric ordinal (name order) as the ranking key — the two-phase
    # primitive range-buckets on its leading column, which must be
    # numeric/date/timestamp
    df = spark.createDataFrame(
        listing, "__ord long, file_name string, bytes long"
    )
    return bin_by_prefix(df, ["__ord"], "bytes", target_bytes).select(
        "file_name", "bytes", "bin", "files_in_bin", "bin_bytes"
    )


def bin_by_prefix(
    df: DataFrame,
    order_cols: list[str],
    bytes_col: str,
    target_bytes: int,
) -> DataFrame:
    """The compaction planner's binning core, factored out so the SAME
    algebra runs over any (ordering key, size) table — a real FS
    listing in compaction_plan, or a materialized listing table for
    the DuckDB-oracle twin (round-13 verdict task 3: only the
    file-metadata INPUT is non-SQL-expressible; this half is).

    Each row lands in bin ``floor(exclusive_prefix / target)`` in
    ``order_cols`` order — deterministic first-fit on the two-phase
    distributed prefix sum (no single-partition window), with the
    per-bin rollup columns a compaction job consumes appended."""
    from ..operators.ranking import with_running_total

    p = with_running_total(df, order_cols, bytes_col, out_col="__run")
    binned = p.withColumn(
        "bin",
        F.floor(
            (F.col("__run") - F.col(bytes_col)) / F.lit(float(target_bytes))
        ).cast("long"),
    ).drop("__run")
    per_bin = binned.groupBy("bin").agg(
        F.count("*").alias("files_in_bin"),
        F.sum(bytes_col).cast("long").alias("bin_bytes"),
    )
    return binned.join(per_bin, "bin")
