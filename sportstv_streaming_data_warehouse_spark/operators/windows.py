"""Window-function-shaped operators.

The reference has no SQL window functions; it implements argmax and YoY
growth driver-side in R (BusinessAnalysis.PractII.VarmaA.Rmd:246-247,
440-447, 197-202). Here they are distributed window ops, so nothing but
the final small result ever reaches the driver.

Scale note: a per-group argmax is a single shuffle on the partition key
(no global sort); YoY lag over per-year totals operates on a tiny
aggregated input, so the single-partition window is safe.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def per_group_argmax(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    n: int = 1,
) -> DataFrame:
    """Top-n rows per group (report.Rmd:440-447's lapply/which.max).

    ``order_by`` should end with a unique tiebreaker so results are
    deterministic under any partitioning.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def yoy_growth(
    df: DataFrame,
    year_col: str = "year",
    value_col: str = "total",
    out_col: str = "growth_pct",
) -> DataFrame:
    """Year-over-year % growth via lag() (report.Rmd:197-202 in R)."""
    w = Window.orderBy(year_col)
    prev = F.lag(F.col(value_col)).over(w)
    return df.withColumn(
        out_col,
        (F.col(value_col) - prev) / prev * 100.0,
    )


def with_session_ids(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: int = 1800,
) -> DataFrame:
    """Assign per-user session ids: a gap STRICTLY GREATER than
    ``gap_s`` seconds starts a new session (lag + running-sum windows,
    deterministic order (ts, id)). The ONE definition behind the
    w_sessionize rollup, the x_session_features feature table, and the
    streaming sessionizer's batch twin — a gap-rule change lands
    everywhere at once. Both windows and any downstream per-(user,
    session) aggregation share a single shuffle on ``user_col``."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    run = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.col(ts_col).cast("long") - prev_ts.cast("long")) > gap_s)
    ).cast("int")
    return df.withColumn("__new_session", new_session).withColumn(
        "session_id", F.sum("__new_session").over(run).cast("long")
    ).drop("__new_session")


def forward_fill(
    daily: DataFrame,
    series_cols: Sequence[str],
    days: DataFrame,
    day_col: str = "d",
    value_col: str = "v",
) -> DataFrame:
    """LOCF over a dense spine: observed ``daily`` rows at (series, day)
    grain are expanded to every day in ``days`` per observed series,
    missing days carrying the last observed ``value_col`` (null before
    the first observation; ``is_filled`` flags synthesized cells). ONE
    shuffle on the series key; per-partition window state is bounded by
    the spine length. The one definition behind the w_forward_fill
    catalog query and its planted tests."""
    series = daily.select(*series_cols).distinct()
    spine = series.crossJoin(F.broadcast(days))
    j = spine.join(daily, [*series_cols, day_col], "left")
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        *series_cols,
        day_col,
        F.last(value_col, ignorenulls=True).over(w).alias("filled_value"),
        F.col(value_col).isNull().alias("is_filled"),
    )


def interpolate_linear(
    daily: DataFrame,
    series_cols: Sequence[str],
    day_col: str = "d",
    value_col: str = "v",
) -> DataFrame:
    """Linear interpolation across gap days, exact to the milli-unit.

    ``daily`` holds observed (series, day, LONG value) rows — callers
    pass values in integer milli-units so the interpolation arithmetic
    is exact and engine-portable (no IEEE rounding divergence). Each
    series is densified over its OWN [min(day), max(day)] span — a
    per-series ``sequence`` explode, so the spine is narrow per series
    and absent series never materialize (no global cross join). Gap
    cells get

        prev + floor((next - prev) * (d - d_prev) / (d_next - d_prev))

    with an explicit pmod-based floor division (Spark's integral ``div``
    truncates toward zero, which diverges from floor on decreasing
    segments; the pmod form is floor in both Spark and DuckDB, keeping
    the SQL oracle bit-identical). ONE shuffle on the series key;
    window state is bounded by the span length, never event volume.
    Complements :func:`forward_fill` (LOCF) — this fills with the
    straight line between the surrounding observations instead of a
    step function.
    """
    bounds = daily.groupBy(*series_cols).agg(
        F.min(day_col).alias("__lo"), F.max(day_col).alias("__hi")
    )
    spine = bounds.select(
        *series_cols,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias(day_col),
    )
    j = spine.join(daily, [*series_cols, day_col], "left")
    w_prev = (
        Window.partitionBy(*series_cols)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*series_cols)
        .orderBy(day_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col(value_col).isNotNull(), F.col(day_col))
    prev_v = F.last(value_col, ignorenulls=True).over(w_prev)
    prev_d = F.last(obs_day, ignorenulls=True).over(w_prev)
    next_v = F.first(value_col, ignorenulls=True).over(w_next)
    next_d = F.first(obs_day, ignorenulls=True).over(w_next)
    num = (next_v - prev_v) * F.datediff(F.col(day_col), prev_d)
    den = F.datediff(next_d, prev_d)
    pmod = ((num % den) + den) % den
    interp = prev_v + ((num - pmod) / den).cast("long")
    return j.select(
        *series_cols,
        day_col,
        F.coalesce(F.col(value_col), interp).alias("filled_value"),
        F.col(value_col).isNull().alias("is_interpolated"),
    )


def out_of_order_stats(
    df: DataFrame, seq_col: str = "event_id", ts_col: str = "ts"
) -> DataFrame:
    """Per-day late-arrival statistics over a global ingest sequence —
    the body of the q_out_of_order_audit catalog query, extracted so the
    planted-disorder tests drive THE SAME code path (the fixture events
    are perfectly ordered, so the catalog data alone would leave the
    lateness branch unexercised).

    A row is LATE if some earlier-``seq_col`` row carries a later
    ``ts_col``; lateness is the whole-second gap to the running maximum
    (floored per operand, matching unix_timestamp), i.e. the minimum
    watermark delay that would have captured the row. The running max
    rides the two-phase distributed primitive (ranking.with_running_max)
    — no single-partition window.
    """
    from .ranking import with_running_max

    r = with_running_max(
        df.select(seq_col, ts_col), [seq_col], ts_col, out_col="__run_max"
    )
    late = F.col(ts_col) < F.col("__run_max")
    return r.groupBy(
        F.date_format(F.to_date(ts_col), "yyyy-MM-dd").alias("event_day")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("n_late"),
        (
            F.sum(F.when(late, 1).otherwise(0)).cast("double") / F.count("*")
        ).alias("late_share"),
        F.max(
            F.when(
                late,
                F.unix_timestamp("__run_max") - F.unix_timestamp(ts_col),
            ).otherwise(0)
        )
        .cast("long")
        .alias("max_lateness_s"),
    )
