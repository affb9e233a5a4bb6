"""Streaming forward fill / LOCF — the streaming twin of the batch
``w_forward_fill`` catalog query (operators/windows.forward_fill).

The batch operator expands observed (series, day) sums onto a dense date
spine and carries the last observed daily value across gap days with
``last(..., ignorenulls=True)``. Streaming cannot express that with a
windowed aggregate: gap days have ZERO input rows, and no built-in
stateful operator synthesizes output rows for empty windows. So this is
the ``applyInPandasWithState`` case (SURVEY.md §2.10's escape hatch,
same as sessionize.py): per-series state carries the last observed
daily value plus the not-yet-finalized daily sums, and each watermark
advance emits one finalized row per elapsed day — observed days with
their (order-independent) sum, gap days with the carried value and
``is_filled = true``.

Semantics vs the batch twin (pinned by tests/test_stream_forward_fill):
- a day is FINAL once the watermark passes its end; late rows inside the
  watermark still land in the right day (pending sums accumulate across
  micro-batches until finalization),
- the per-series spine starts at the series' first observed day (a
  stream cannot know a global "first day" the way the batch cross-join
  spine does) and extends to its LAST observed day — gaps between
  observations are filled, but a dead series does not emit unbounded
  trailing fills,
- daily sums accumulate in integer micro-units so cross-batch arrival
  order cannot change the float result (the batch twin's DECIMAL(18,6)
  trick, re-expressed for pandas state).

Scale posture: state per series is two scalars plus the pending days
still inside the watermark horizon — bounded by series-count x horizon,
never by stream history. The grouped shuffle is on the series key only.
Series-count itself is the residual growth term: LOCF's contract keeps
the carry value alive for however long the next observation takes, so a
DEAD series (decommissioned device) otherwise leaks its slot forever.
``state_ttl`` bounds that: a series with no pending days whose last
emission is ``state_ttl`` behind the watermark is evicted on an
event-time timeout. The trade-off is explicit data loss relative to the
batch twin — a series returning after eviction restarts its spine at
the new observation and the dormancy gap is NOT backfilled — which is
why the DEFAULT is None (exact batch parity; funnel's eviction merely
re-emits, LOCF's suppresses fills, so the defaults differ). Production
deployments with churning series should set it (e.g. "365 days").
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DAY_MS = 86_400_000
_MICRO = 1_000_000

# state: last emitted day (epoch days), its carried value in micro-units,
# and the pending (day -> micro-sum) map as two parallel arrays
STATE_SCHEMA = StructType(
    [
        StructField("last_day", LongType()),
        StructField("last_micro", LongType()),
        StructField("pend_days", ArrayType(LongType())),
        StructField("pend_micros", ArrayType(LongType())),
    ]
)


def _output_schema(series_cols: Sequence[str]) -> StructType:
    fields = [StructField(c, StringType()) for c in series_cols]
    return StructType(
        fields
        + [
            StructField("d", DateType()),
            StructField("filled_value", DoubleType()),
            StructField("is_filled", BooleanType()),
        ]
    )


def forward_fill_stream(
    stream: DataFrame,
    series_cols: Sequence[str] = ("series_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    delay: str = "1 day",
    state_ttl: str | None = None,
) -> DataFrame:
    """events(ts, series..., value) → append-mode LOCF daily series.

    Returns one row per (series, day) from the series' first observed
    day through its last, finalized as the watermark passes each day:
    (series..., d DATE, filled_value DOUBLE, is_filled BOOLEAN).
    ``state_ttl`` evicts dormant series slots (module docstring) —
    None, the default, keeps exact batch-twin parity.
    """
    from .util import duration_ms

    out_schema = _output_schema(series_cols)
    n_keys = len(series_cols)
    ttl_ms = duration_ms(state_ttl) if state_ttl is not None else None
    key_names = list(series_cols)
    # captured as enclosing-scope ints (pickled by value): the closure
    # stays executor-self-contained without shadowing the module constants
    day_ms, micro = DAY_MS, _MICRO

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # self-contained closure: stdlib/pandas only (no module globals)
        import pandas as _pd

        pending: dict[int, int] = {}
        last_day, last_micro = None, 0
        if state.exists:
            last_day, last_micro, pend_days, pend_micros = state.get
            pending = dict(zip(pend_days, pend_micros))
            if last_day < 0:
                last_day = None  # sentinel: nothing emitted yet

        if not state.hasTimedOut:
            for pdf in pdfs:
                # datetime64[ns] → epoch days (session tz is UTC)
                days = pdf[ts_col].astype("int64") // (day_ms * 1_000_000)
                micros = (pdf[value_col] * micro).round().astype("int64")
                for d, m in zip(days, micros):
                    d = int(d)
                    if last_day is not None and d <= last_day:
                        continue  # older than the finalized frontier
                    pending[d] = pending.get(d, 0) + int(m)

        # finalized frontier: every day whose END the watermark passed
        wm_ms = state.getCurrentWatermarkMs()
        final_day = wm_ms // day_ms - 1
        rows_key: list[list] = [[] for _ in range(n_keys)]
        rows_d: list[int] = []
        rows_v: list[float] = []
        rows_f: list[bool] = []
        if pending:
            start = last_day + 1 if last_day is not None else min(pending)
            target = min(final_day, max(pending))
            for d in range(start, target + 1):
                if d in pending:
                    last_micro = pending.pop(d)
                    filled = False
                else:
                    filled = True
                for i in range(n_keys):
                    rows_key[i].append(key[i])
                rows_d.append(d)
                rows_v.append(last_micro / micro)
                rows_f.append(filled)
                last_day = d

        if (
            ttl_ms is not None
            and state.hasTimedOut
            and not pending
            and not rows_d
        ):
            # TTL eviction: the DORMANCY timeout fired (a flush timeout
            # always emits or leaves pending, so an empty invocation
            # means nothing has happened for a full TTL) — drop the
            # slot so state tracks LIVE series, not every series ever
            # seen (see the module docstring for the restart trade-off)
            state.remove()
            return

        state.update(
            (
                -1 if last_day is None else last_day,
                last_micro,
                sorted(pending),
                [pending[d] for d in sorted(pending)],
            )
        )
        if pending:
            # wake when the FIRST un-emitted day becomes finalizable:
            # that is last_day+1 when it is a gap day strictly before the
            # earliest pending observation (review finding: waking only
            # at (min(pending)+1) would stall finalizable gap days for as
            # long as the next observation is away — values stay correct
            # but emission latency grows with the gap), else the earliest
            # pending day itself. Always > the current watermark: after
            # the emission loop last_day >= final_day or pending's
            # minimum > final_day, so both candidates clear wm_ms.
            next_day = min(pending)
            if last_day is not None and last_day + 1 < next_day:
                next_day = last_day + 1
            state.setTimeoutTimestamp((next_day + 1) * day_ms)
        elif ttl_ms is not None:
            # dormancy eviction clock: ttl of EVENT TIME past the
            # series' own last emitted day (not the invocation-time
            # watermark — a flush that runs after a big watermark jump
            # would otherwise restart the clock from the jump and keep
            # an already-dormant series alive a full extra TTL); clamped
            # above the current watermark because past timestamps are
            # rejected — an overdue series then times out on the next
            # no-data batch
            anchor = (
                (last_day + 1) * day_ms if last_day is not None else wm_ms
            )
            state.setTimeoutTimestamp(max(wm_ms + 1, anchor + ttl_ms))

        if rows_d:
            data = {name: rows_key[i] for i, name in enumerate(key_names)}
            data["d"] = [
                _pd.Timestamp(d * day_ms, unit="ms").date() for d in rows_d
            ]
            data["filled_value"] = rows_v
            data["is_filled"] = rows_f
            yield _pd.DataFrame(data)

    return (
        stream.withWatermark(ts_col, delay)
        .groupBy(*[F.col(c).cast("string").alias(c) for c in series_cols])
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
