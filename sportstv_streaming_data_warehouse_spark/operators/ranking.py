"""Exact distributed ranking — global row_number / NTILE without a
single-partition sort.

Spark's ``Window.orderBy(...)`` with no partitionBy plans ONE task holding
the entire dataset — the classic scale-killer for global ranking (the
reference never ranks more than its pre-aggregated fact, so it never hits
this; report.Rmd's ordered tables are display-layer). The exact
alternative here is textbook two-phase ranking:

1. bucket rows by approximate range boundaries over the leading sort
   column (``percentile_approx`` — driver-side STATS, a few doubles; the
   boundary precision affects only balance, never correctness);
2. count rows per bucket (an aggregate, not row data) and fold the counts
   into literal cumulative offsets;
3. ``row_number`` WITHIN each bucket — a fully distributed window — plus
   the bucket's offset = the exact global rank. NTILE follows in closed
   form from the rank and the total count.

The result is identical to ``ROW_NUMBER() / NTILE(k) OVER (ORDER BY ...)``
(the DuckDB oracle for x_quality_deciles runs exactly that) while every
task holds one bucket's rows instead of everything. Ties must be broken
by the caller's order_cols (include a unique key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket(key: Column, bounds: list[float]) -> Column:
    """Index of the range bucket = number of boundaries <= key."""
    if not bounds:
        return F.lit(0)
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    return F.size(F.filter(arr, lambda b: b <= key))


def _ranked(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int,
    accuracy: int,
) -> tuple[DataFrame, int]:
    """df + __rn (exact 1-based global rank over order_cols), total count."""
    # the input feeds the boundary pass, the count pass, and the returned
    # plan — persist it for the two eager stats passes (callers pass a
    # narrow projection; e.g. x_quality_deciles' (doc_id, quality) avoids
    # re-running the quality regexes per pass), then unpersist so repeated
    # operator calls don't accumulate cache entries. The returned plan
    # recomputes one scan from source.
    from pyspark.storagelevel import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    key = F.col(order_cols[0]).cast("double")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds_row = df.agg(F.percentile_approx(key, qs, accuracy).alias("b")).first()
    bounds = sorted({b for b in (bounds_row["b"] or []) if b is not None})

    bucketed = df.withColumn("__bkt", _bucket(key, bounds))
    counts = {
        r["__bkt"]: r["cnt"]
        for r in bucketed.groupBy("__bkt").agg(F.count("*").alias("cnt")).collect()
    }
    df.unpersist()
    total = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    if offsets:
        off = F.element_at(
            F.create_map(
                *[F.lit(x) for kv in offsets.items() for x in kv]
            ),
            F.col("__bkt"),
        )
    else:
        off = F.lit(0)

    w = Window.partitionBy("__bkt").orderBy(*order_cols)
    ranked = bucketed.withColumn(
        "__rn", (F.row_number().over(w) + off).cast("long")
    )
    return ranked, total


def with_global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "row_num",
    n_buckets: int = 64,
    accuracy: int = 10000,
) -> DataFrame:
    """Exact global ROW_NUMBER() OVER (ORDER BY order_cols), distributed."""
    ranked, _ = _ranked(df, order_cols, n_buckets, accuracy)
    return ranked.withColumnRenamed("__rn", out_col).drop("__bkt")


def with_running_total(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_total",
    n_buckets: int = 64,
    accuracy: int = 10000,
) -> DataFrame:
    """Exact distributed prefix sum: SUM(value) OVER (ORDER BY order_cols
    ROWS UNBOUNDED PRECEDING) with no single-partition window.

    Same two-phase shape as the ranking: range-bucket on the leading
    order column, per-bucket value sums fold into literal offsets, and a
    distributed within-bucket running sum adds the bucket offset. The
    primitive behind deterministic shard packing (catalog
    x_pack_shards), running quotas, and cumulative-distribution cuts.
    """
    from pyspark.storagelevel import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    key = F.col(order_cols[0]).cast("double")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds_row = df.agg(F.percentile_approx(key, qs, accuracy).alias("b")).first()
    bounds = sorted({b for b in (bounds_row["b"] or []) if b is not None})

    bucketed = df.withColumn("__bkt", _bucket(key, bounds))
    sums = {
        r["__bkt"]: r["s"]
        for r in bucketed.groupBy("__bkt")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    df.unpersist()
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(sums):
        offsets[b] = acc
        acc += sums[b] or 0
    if offsets:
        off = F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("__bkt"),
        )
    else:
        off = F.lit(0)

    w = (
        Window.partitionBy("__bkt")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return bucketed.withColumn(
        out_col, (F.sum(value_col).over(w) + off).cast("long")
    ).drop("__bkt")


def distributed_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: list[str],
    out_col: str = "tile",
    n_buckets: int = 64,
    accuracy: int = 10000,
) -> DataFrame:
    """Exact NTILE(n_tiles) OVER (ORDER BY order_cols), distributed.

    SQL NTILE semantics: with n rows, the first n % n_tiles tiles hold
    floor(n / n_tiles) + 1 rows, the rest floor(n / n_tiles) — computed in
    closed form from the exact global rank, as literal arithmetic.
    """
    ranked, total = _ranked(df, order_cols, n_buckets, accuracy)
    base, rem = divmod(total, n_tiles)
    cut = rem * (base + 1)
    rn = F.col("__rn")
    if base == 0:
        # fewer rows than tiles: row k is tile k
        tile = rn
    else:
        tile = F.when(
            rn <= cut, F.floor((rn - 1) / (base + 1)) + 1
        ).otherwise(rem + F.floor((rn - cut - 1) / base) + 1)
    return (
        ranked.withColumn(out_col, tile.cast("int"))
        .drop("__bkt", "__rn")
    )
