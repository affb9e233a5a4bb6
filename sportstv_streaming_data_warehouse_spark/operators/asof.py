"""As-of (point-in-time) join — a custom operator Spark lacks natively,
built as a composition of existing DataFrame ops (the strategy SURVEY.md
prescribes for operators with no built-in: composition first, UDF last).

For each left row, attach the latest right row with
``right.ts <= left.ts`` per key — the temporal-enrichment primitive
(latest dimension version, last known price/config/consent state at
event time) that a streaming warehouse needs for SCD-style lookups.

Implementation: tag both sides, union, and run ``last(..., ignorenulls)``
over a (key, ts) window — ONE shuffle on the key, no range self-join, no
per-row search. At 100 TB this is a single sort-within-partition pass;
skewed keys fall under the same salting/AQE story as any other shuffle.
DuckDB's native ASOF JOIN is the oracle (plans/catalog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the value columns of the
    most recent right row at-or-before its timestamp (per ``on`` key).

    Ties (equal timestamps) resolve to the right row — matching DuckDB's
    inclusive ``l.ts >= r.ts`` semantics. ``tolerance_seconds`` nulls out
    matches older than the given horizon (pandas merge_asof-style).
    """
    l_tagged = left.withColumn("__src", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    # ONE struct carries the whole right row (ts + all value columns), so
    # the filled values always come from the same, truly-latest right row
    # — including its NULLs. Per-column last(ignorenulls) would instead
    # stitch values from different right rows (deviating from DuckDB ASOF).
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.struct(
            F.col(right_ts).alias("ts"),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("__r"),
    ).withColumn("__src", F.lit(0))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # right rows (__src=0) sort BEFORE left rows at equal __ts, so a
    # same-instant right row is visible to the left row (inclusive <=)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__r", F.last("__r", ignorenulls=True).over(w))

    out = filled.filter(F.col("__src") == 1)
    if tolerance_seconds is not None:
        horizon = (
            F.col("__ts").cast("long") - F.col("__r.ts").cast("long")
        ) <= tolerance_seconds
        out = out.withColumn("__r", F.when(horizon, F.col("__r")))

    out = out.withColumn("asof_ts", F.col("__r.ts"))
    for c in value_cols:
        out = out.withColumn(f"asof_{c}", F.col(f"__r.{c}"))
    return out.drop("__src", "__ts", "__r")
