"""Streaming exact deduplication — the streaming twin of
operators/dedup.exact_dedup (SURVEY §2.1 S10's INSERT-IGNORE semantics,
etl.R:300-312, applied to a live feed).

``dropDuplicatesWithinWatermark`` keeps the FIRST arrival per key and
drops later duplicates that arrive within the watermark delay of the
first — exactly INSERT IGNORE over a stream. State is one entry per key
seen inside the watermark horizon; the event-time watermark evicts
older keys, so state is bounded by (key arrival rate × delay), never by
stream history — the property that keeps this runnable forever at
100 TB/day. Plain ``dropDuplicates`` on a stream would keep every key
in state for the lifetime of the query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    delay: str = "2 days",
) -> DataFrame:
    """First-arrival-wins dedup on ``key_cols`` with duplicates dropped
    inside the ``delay`` watermark horizon of the first arrival."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )
