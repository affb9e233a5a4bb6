"""Streaming rolling N-day distinct users — the streaming twin of the
batch ``w_rolling_distinct_7d`` catalog operator (contribution-explode
re-expression of a moving COUNT DISTINCT, which no engine supports as a
windowed aggregate).

Same algebra as the batch op, staged through Structured Streaming's
stateful operators:

1. contribution explode — each event on day d feeds exactly the N
   observation days ``[d, d+N-1]`` (constant factor-N row blow-up,
   stateless; the event time becomes the observation day, which is
   always >= the arrival time, so it is watermark-monotone).
2. ``dropDuplicatesWithinWatermark([user, obs_day])`` — ONE dedup does
   all the distinct work: intra-day repeats AND multi-day activity
   inside the same window collapse to a single contribution per
   (user, window). State is one entry per user-window inside the
   watermark horizon — bounded by active-users × horizon, never by
   stream history. (A pre-dedup on (user, day) before the explode would
   shrink the dedup's INPUT 7×, but Spark disallows redefining the
   watermark column mid-pipeline, and the state size — the thing that
   matters — is identical either way.)
3. tumbling 1-day window count on the observation day, emitted in
   append mode when the watermark passes the window — exactly one final
   row per observation day.

Chained stateful operators (dedup → windowed agg) ride Spark 3.4+'s
multi-stateful-operator watermark propagation
(spark.sql.streaming.statefulOperator.allowMultiple, on by default).

The batch↔stream parity test (tests/test_stream_rolling_distinct.py)
pins this against the catalog operator's algebra on the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rolling_distinct_users_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_days: int = 7,
    delay_days: int = 2,
) -> DataFrame:
    """Exact rolling ``window_days``-day distinct ``user_col`` count per
    observation day, in append mode. Returns (obs_day DATE, active_users
    BIGINT) rows finalized as the watermark passes each day.

    ``delay_days`` is the lateness tolerance for EVENT time. Because the
    watermark column is the explode-shifted observation day (up to
    window_days-1 days AHEAD of the event), the internal watermark delay
    is ``delay_days + window_days - 1`` days — without that compensation
    an on-time event arriving after a same-day event in an earlier batch
    would find its earliest observation windows already finalized and be
    silently dropped (undercounting distinct users)."""
    day = F.to_date(F.col(ts_col))
    contrib = stream.select(
        F.col(user_col).alias("user_id"),
        F.explode(
            F.sequence(day, F.date_add(day, window_days - 1))
        ).alias("obs_day"),
    ).select(
        "user_id",
        "obs_day",
        F.col("obs_day").cast("timestamp").alias("obs_ts"),
    )
    effective = f"{delay_days + window_days - 1} days"
    once_per_window = (
        contrib.withWatermark("obs_ts", effective)
        .dropDuplicatesWithinWatermark(["user_id", "obs_day"])
    )
    return (
        once_per_window.groupBy(F.window("obs_ts", "1 day").alias("w"))
        .agg(F.count("*").alias("active_users"))
        .select(F.to_date(F.col("w.start")).alias("obs_day"), "active_users")
    )
