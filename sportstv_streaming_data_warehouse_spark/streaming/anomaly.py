"""Streaming daily-KPI anomaly detection — the streaming twin of the
batch ``x_anomaly_zscore`` catalog query, lifted from row grain to the
monitoring grain a stream actually alerts on: "is TODAY's mean value
for this event type anomalous against its own history?"

Per event type, ``applyInPandasWithState`` keeps (a) the finalized
history as three exact integers — day count, Σ of per-day means in
milli-units, Σ of their squares — and (b) the pending per-day partial
sums still inside the watermark horizon. When the watermark passes a
day, the day's exact mean is scored against the history z-score
((day_mean − hist_mean) / hist_std), emitted, and folded into the
history. All accumulation is integer milli-unit arithmetic, so the
emitted rows are ARRIVAL-ORDER INDEPENDENT (the parity test pins them
bit-equal to an offline replay of the same day sequence) — the same
exact-variance design as the batch twin's integer sums.

Days emit IN EVENT-TIME ORDER per event type (pending days are flushed
ascending as the watermark advances), so "history" is well-defined:
every day is scored against exactly the days before it.

Scale posture: state per event type is 3 longs + the pending days
inside the watermark horizon (each 3 longs) — bounded by categories ×
horizon, never by stream volume. Milli-unit squares bound: |value| ≤
~9·10⁵ per-day means over ~10⁹ days before a long overflows — far past
any real monitor's horizon.
"""

from __future__ import annotations

from collections.abc import Iterator

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
MILLI = 1_000

STATE_SCHEMA = StructType(
    [
        StructField("hist_days", LongType()),
        StructField("hist_sum_milli", LongType()),
        StructField("hist_sumsq", LongType()),  # Σ (day_mean_milli)² (may be large; see bound)
        StructField("pend_days", ArrayType(LongType())),
        StructField("pend_n", ArrayType(LongType())),
        StructField("pend_sum_milli", ArrayType(LongType())),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("obs_day", DateType()),
        StructField("day_n", LongType()),
        StructField("day_mean", DoubleType()),
        StructField("hist_days", LongType()),
        StructField("z_score", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)


def daily_anomaly_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    delay: str = "1 day",
    z_threshold: float = 3.0,
    min_history_days: int = 3,
) -> DataFrame:
    """stream(ts, key, value) → append-mode per-(key, day) anomaly rows.

    Each day finalizes (watermark-passed) in event-time order with its
    exact mean, the history depth it was scored against, the z-score
    (NULL until ``min_history_days`` days of history exist, and NULL
    when the history variance is 0), and ``is_anomaly`` (|z| ≥
    ``z_threshold``).
    """
    day_ms, milli = DAY_MS, MILLI
    zt, min_hist = float(z_threshold), int(min_history_days)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math as _m

        import pandas as _pd

        hist_d, hist_s, hist_q = 0, 0, 0
        pending: dict[int, list[int]] = {}
        if state.exists:
            hist_d, hist_s, hist_q, pd_days, pd_n, pd_s = state.get
            pending = {
                d: [n, s] for d, n, s in zip(pd_days, pd_n, pd_s)
            }

        if not state.hasTimedOut:
            for pdf in pdfs:
                days = pdf[ts_col].astype("int64") // (day_ms * 1_000_000)
                millis = (pdf[value_col] * milli).round().astype("int64")
                for d, m in zip(days, millis):
                    d = int(d)
                    ent = pending.get(d)
                    if ent is None:
                        pending[d] = [1, int(m)]
                    else:
                        ent[0] += 1
                        ent[1] += int(m)

        # finalize every pending day the watermark has passed, ascending
        wm_ms = state.getCurrentWatermarkMs()
        final_day = wm_ms // day_ms - 1
        out = {
            "event_type": [], "obs_day": [], "day_n": [], "day_mean": [],
            "hist_days": [], "z_score": [], "is_anomaly": [],
        }
        for d in sorted(k for k in pending if k <= final_day):
            n, s = pending.pop(d)
            mean_milli = s // n if s >= 0 else -((-s) // n)  # trunc toward 0
            z = None
            if hist_d >= min_hist:
                hm = hist_s / hist_d
                var = hist_q / hist_d - hm * hm
                if var > 0:
                    z = (mean_milli - hm) / _m.sqrt(var)
            out["event_type"].append(key[0])
            out["obs_day"].append(
                _pd.Timestamp(d * day_ms, unit="ms").date()
            )
            out["day_n"].append(n)
            out["day_mean"].append(mean_milli / milli)
            out["hist_days"].append(hist_d)
            out["z_score"].append(z)
            out["is_anomaly"].append(z is not None and abs(z) >= zt)
            hist_d += 1
            hist_s += mean_milli
            hist_q += mean_milli * mean_milli

        state.update(
            (
                hist_d, hist_s, hist_q,
                sorted(pending),
                [pending[d][0] for d in sorted(pending)],
                [pending[d][1] for d in sorted(pending)],
            )
        )
        if pending:
            state.setTimeoutTimestamp((min(pending) + 1) * day_ms)

        if out["obs_day"]:
            yield _pd.DataFrame(
                {
                    **out,
                    "day_n": _pd.array(out["day_n"], dtype="Int64"),
                    "hist_days": _pd.array(out["hist_days"], dtype="Int64"),
                    "z_score": _pd.array(out["z_score"], dtype="Float64"),
                }
            )

    keyed = stream.withWatermark(ts_col, delay).select(
        F.col(ts_col),
        F.col(key_col).cast("string").alias(key_col),
        F.col(value_col).cast("double").alias(value_col),
    )
    return keyed.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
