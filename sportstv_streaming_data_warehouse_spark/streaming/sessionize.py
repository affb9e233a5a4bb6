"""Custom stateful streaming operator: user sessionization via
applyInPandasWithState (SURVEY.md §2.10 — the escape hatch for semantics
windowed aggregation can't express).

A session is a run of events for one user with gaps < ``gap``. Sessions
aren't tumbling windows (their extent depends on the data), so they need
per-key state: the open session (start, last_ts, count) survives across
micro-batches; a batch that arrives after a gap closes it and emits it.

Scale posture: state is one tiny tuple per ACTIVE user (not per event);
the grouped shuffle is on user_id. Open sessions also close via event-
time timeout (watermark-driven), so state for idle users is evicted —
bounded regardless of total history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# state: epoch-micro timestamps + count (plain longs — pickle-friendly)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("count", LongType()),
    ]
)


def sessionize_stream(events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour") -> DataFrame:
    """events(ts timestamp, user_id long, ...) → closed sessions.

    A session is emitted when a later event (or the event-time timeout)
    proves the gap elapsed. The still-open tail session stays in state.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # self-contained closure: stdlib/pandas only (no module globals)
        import pandas as _pd

        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, count = state.get
            state.remove()
            yield _pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [_pd.Timestamp(start_us, unit="us")],
                    "session_end": [_pd.Timestamp(last_us, unit="us")],
                    "n_events": [count],
                }
            )
            return

        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(t.value // 1000) for t in pdf["ts"])

        # Interval merge: the stored open session is an interval
        # [start_us, last_us] and every batch event is a 1-event interval.
        # Folding the start-sorted intervals with the gap rule reproduces
        # batch sessionization even for cross-batch OUT-OF-ORDER events
        # (newer than the watermark, older than the stored last_us):
        # a contained event only bumps the count, a within-gap earlier
        # event extends the session backwards, and last_us never regresses.
        intervals = [(t, t, 1) for t in ts_us]
        if state.exists:
            intervals.append(tuple(state.get))
        intervals.sort()

        out_start, out_end, out_n = [], [], []
        start_us, last_us, count = intervals[0]
        for s, e, n in intervals[1:]:
            if s - last_us <= gap_us:
                last_us = max(last_us, e)
                count += n
            else:
                out_start.append(_pd.Timestamp(start_us, unit="us"))
                out_end.append(_pd.Timestamp(last_us, unit="us"))
                out_n.append(count)
                start_us, last_us, count = s, e, n

        state.update((start_us, last_us, count))
        # event-time timeout: close the open session once the watermark
        # passes last_ts + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_minutes * 60 * 1000)
        if out_n:
            yield _pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_n),
                    "session_start": out_start,
                    "session_end": out_end,
                    "n_events": out_n,
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
