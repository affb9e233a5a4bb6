"""Streaming ordered-conversion funnel — the streaming twin of the
batch ``w_event_funnel`` catalog query (view → click → purchase, each
stage strictly after the user's qualifying previous stage).

Exactness under out-of-order arrival is the crux: a greedy state
machine updated in ARRIVAL order is wrong (a late-arriving earlier view
can retroactively qualify a click that was discarded), so per user the
operator buffers raw (ts, stage) pairs ONLY inside the watermark
horizon and advances the funnel machine exclusively over FINALIZED
events in ascending event-time order. Once the watermark passes an
event it can never be preceded by new data, so the greedy advance over
the finalized prefix computes exactly the batch semantics:

    t_view     = min ts of views
    t_click    = min ts of clicks    with ts > t_view
    t_purchase = min ts of purchases with ts > t_click

(strict inequalities — a click at the very instant of the view does
not convert, matching the batch oracle's ``e.ts > v.t_view``).

Emission: one append-mode row per COMPLETED stage, (user_id, stage,
stage_ts), emitted in the finalization micro-batch where the stage
first completed. Downstream, the global funnel summary is a plain
streaming aggregate over these per-user rows — the heavy lifting
(ordered, per-user, exactly-once stage detection) happens here.

Scale posture: state per user is three nullable longs + the pending
events inside the watermark horizon — the BUFFER is bounded by
per-user event rate × horizon. Opting into ``state_ttl`` bounds total
state by users active within that horizon (round-6 advisor finding:
without a TTL the per-user slot lives for the stream lifetime): a user
with no pending events whose last activity is ``state_ttl`` behind the
watermark has their slot dropped on an event-time timeout. The
trade-off — and why eviction is OPT-IN (default ``state_ttl=None``,
matching forward_fill_stream; round-7 advisor finding): a user
returning after a TTL eviction restarts the funnel machine and
re-emits duplicate (user_id, stage) rows, which overcounts in
downstream append-mode aggregates. The default keeps the exact
stream-lifetime semantics; pass e.g. ``state_ttl="30 days"`` on
unbounded-user deployments where bounded state matters more than
per-dormancy-epoch re-emission. Users shuffle once on user_id (the
same single-exchange key the batch funnel reuses across stages).

Reference anchor: the reference's event stream feeds exactly this
product funnel (README.md:195-206's golden funnel percentages); the
batch twin is cat:`w_event_funnel`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STAGES = ("view", "click", "purchase")

STATE_SCHEMA = StructType(
    [
        # completed-stage timestamps in MICROSECONDS since epoch;
        # -1 = stage not yet completed
        StructField("t_view_us", LongType()),
        StructField("t_click_us", LongType()),
        StructField("t_purchase_us", LongType()),
        # pending (not-yet-finalized) events inside the watermark horizon
        StructField("pend_ts_us", ArrayType(LongType())),
        StructField("pend_stage", ArrayType(LongType())),  # index into STAGES
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", StringType()),
        StructField("stage_ts", TimestampType()),
    ]
)


def funnel_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    delay: str = "1 day",
    state_ttl: str | None = None,
) -> DataFrame:
    """stream(ts, user, event_type) → append-mode (user_id, stage,
    stage_ts) rows, one per completed funnel stage, exact under any
    arrival order within the watermark ``delay``. Passing ``state_ttl``
    opts into eviction: per-user state drops once the user has no
    pending events and the watermark is ``state_ttl`` past their last
    activity (the default None never evicts — see the module docstring
    for the returning-user re-emission trade-off)."""
    from .util import duration_ms

    stage_idx = {s: i for i, s in enumerate(STAGES)}
    ttl_us = duration_ms(state_ttl) * 1_000 if state_ttl is not None else None

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        t = [-1, -1, -1]
        pending: list[tuple[int, int]] = []
        if state.exists:
            tv, tc, tp, p_ts, p_st = state.get
            t = [tv, tc, tp]
            pending = list(zip(p_ts, p_st))

        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us = pdf[ts_col].astype("int64") // 1_000  # ns → µs
                for u, s in zip(ts_us, pdf[type_col]):
                    si = stage_idx.get(s)
                    if si is not None:
                        pending.append((int(u), si))

        # finalize: advance the funnel machine over watermark-passed
        # events in ascending event-time order
        wm_us = state.getCurrentWatermarkMs() * 1_000
        ready = sorted(e for e in pending if e[0] <= wm_us)
        pending = [e for e in pending if e[0] > wm_us]
        before = list(t)
        for ts_us, si in ready:
            if si == 0:
                if t[0] < 0:
                    t[0] = ts_us
            elif t[si - 1] >= 0 and ts_us > t[si - 1] and t[si] < 0:
                t[si] = ts_us

        if ttl_us is not None and state.hasTimedOut and not pending and not ready:
            # TTL eviction: nothing buffered and nothing to flush —
            # drop the slot so total state tracks ACTIVE users, not
            # every user ever seen (round-6 advisor finding). The
            # ttl_us guard mirrors forward_fill_stream's explicit check:
            # with eviction disabled only flush timeouts fire and those
            # always carry a non-empty `ready`, but that is a non-local
            # invariant of the timeout scheduling — don't rely on it
            # (round-7 advisor finding).
            state.remove()
            return

        state.update(
            (t[0], t[1], t[2], [e[0] for e in pending],
             [e[1] for e in pending])
        )
        if pending:
            state.setTimeoutTimestamp(min(e[0] for e in pending) // 1_000 + 1)
        elif ttl_us is not None:
            # schedule the dormancy eviction: ttl of event time past the
            # current watermark with no pending events
            state.setTimeoutTimestamp(wm_us // 1_000 + ttl_us // 1_000)

        newly = [
            (STAGES[i], t[i]) for i in range(3) if before[i] < 0 <= t[i]
        ]
        if newly:
            yield _pd.DataFrame(
                {
                    "user_id": _pd.array(
                        [key[0]] * len(newly), dtype="Int64"
                    ),
                    "stage": [s for s, _ in newly],
                    "stage_ts": [
                        _pd.Timestamp(us, unit="us") for _, us in newly
                    ],
                }
            )

    keyed = stream.withWatermark(ts_col, delay).select(
        F.col(ts_col),
        F.col(user_col).cast("long").alias(user_col),
        F.col(type_col).cast("string").alias(type_col),
    )
    return keyed.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
