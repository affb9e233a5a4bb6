"""Stream-stream interval join with watermark-bounded state
(SURVEY.md §2.10 extension — the attribution-join surface).

The reference has no streaming tier at all (its 'stream' is a polling
batch loop, loadAnalyticsDB.PractII.VarmaA.R:306); the closest batch
analog here is the as-of enrichment (operators/asof.py). The genuinely
streaming version is Spark's stream-stream inner join: attribute each
click-like event to the signup-like event for the same user that
happened at-or-before it within an attribution horizon.

Scale posture: BOTH sides carry a watermark and the join predicate
bounds the event-time distance, so Spark derives state-retention bounds
for both sides — state holds only rows inside (watermark + horizon),
not unbounded history. Without the time-range predicate the right side
would be retained forever; this module makes the bound part of the
operator's contract rather than a caller obligation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join_stream(
    clicks: DataFrame,
    signups: DataFrame,
    user_col: str = "user_id",
    click_ts: str = "ts",
    signup_ts: str = "signup_ts",
    horizon_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """clicks(user, ts, ...) ⋈ signups(user, signup_ts, ...) →
    one row per (click, qualifying signup) pair where
    signup_ts ∈ [ts - horizon, ts].

    Inner stream-stream join; both inputs must be streaming DataFrames.
    Emits pairs once both watermarks pass; a click with several signups
    inside the horizon emits several rows (downstream dedup/argmax picks
    one — deterministic reduction belongs to the consumer, the join
    itself is pair-complete).
    """
    left = clicks.withWatermark(click_ts, watermark)
    right = signups.withWatermark(signup_ts, watermark)
    on = (
        (left[user_col] == right[user_col])
        & (right[signup_ts] <= left[click_ts])
        & (
            right[signup_ts]
            >= left[click_ts] - F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    return left.join(right, on, "inner").drop(right[user_col])
