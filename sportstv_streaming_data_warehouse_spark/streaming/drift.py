"""Streaming distribution-drift detection — the streaming twin of the
batch ``x_distribution_drift`` catalog query (PSI between a data slice
and a reference distribution).

The batch query compares two static slices; the streaming question is
"did TODAY's category mix drift from the reference?" — the gate a
training pipeline puts in front of an auto-retrain. Each day's
event-type histogram accumulates in ``applyInPandasWithState`` state
(exact integer counts, one dict entry per category — bounded by
category cardinality × watermark-horizon days, never by stream volume)
and, when the watermark passes the day, the finalized histogram is
scored against the broadcast REFERENCE distribution with the same
integer micro-nat PSI terms the batch query hash-matches.

Because state holds exact counts, the emitted rows are ARRIVAL-ORDER
INDEPENDENT — the parity test pins streamed output bit-equal to the
batch computation over the same rows, under shuffled multi-drop
arrival (stronger than the MG twin's guarantee-only parity: exact
aggregation commutes, lossy summaries do not).

The reference distribution is a driver-side mapping (category →
share), captured in the closure — it is static by contract (the
baseline a model shipped with), tiny, and versioned with the stream
job; re-deriving it from a static DataFrame is a ``dict(df.collect())``
at job build time.
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

STATE_SCHEMA = StructType(
    [
        StructField("cats", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("obs_day", DateType()),
        StructField("category", StringType()),
        StructField("n", LongType()),
        StructField("day_total", LongType()),
        StructField("share", DoubleType()),
        StructField("base_share", DoubleType()),
        StructField("psi_micronats", LongType()),
        StructField("drifted", BooleanType()),
    ]
)


def make_psi_term():
    """Factory for the PSI micro-nat term — the exact formula of the
    batch x_distribution_drift query: HALF-AWAY-FROM-ZERO
    round((p−q)·ln(p/q)·1e6) (Spark F.round / DuckDB ROUND semantics;
    Python's built-in round() is half-to-even and would diverge by 1 on
    an exact .5 double). None when either share is 0 (the batch query's
    NULL guard). Returned as a nested closure so cloudpickle ships it
    BY VALUE into the stateful function — executors never import this
    package."""

    def term(share: float, base_share: float) -> int | None:
        import math as _m

        if share <= 0.0 or base_share <= 0.0:
            return None
        x = (share - base_share) * _m.log(share / base_share) * 1e6
        return int(_m.floor(x + 0.5)) if x >= 0 else int(_m.ceil(x - 0.5))

    return term


# module-level instance: the single source of truth the parity tests and
# batch consumers use
psi_micronats = make_psi_term()


def distribution_drift_stream(
    stream: DataFrame,
    baseline: dict[str, float],
    ts_col: str = "ts",
    cat_col: str = "event_type",
    delay: str = "1 day",
    psi_alert_micronats: int = 100_000,
) -> DataFrame:
    """stream(ts, category) → append-mode per-day drift rows.

    One finalized row per (day, observed-or-baseline category) when the
    watermark passes the day: exact count, share, reference share, the
    PSI term, and a ``drifted`` flag (|day PSI total| ≥ the alert
    threshold, default 0.1 nats — the conventional "significant shift"
    PSI cut, stamped on every row of the day so the flag survives
    row-level consumers).
    """
    base = dict(baseline)
    day_ms = DAY_MS
    alert = psi_alert_micronats
    term_fn = make_psi_term()  # by-value closure: see factory docstring

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        counts: dict[str, int] = {}
        if state.exists:
            cats, vals = state.get
            counts = dict(zip(cats, vals))

        if state.hasTimedOut:
            day_epoch = int(key[0])
            state.remove()
            total = sum(counts.values())
            if total == 0:
                return
            rows = []
            day = _pd.Timestamp(day_epoch * day_ms, unit="ms").date()
            # union of observed and baseline categories: a category that
            # VANISHED from the stream still yields a (0, base) row
            for cat in sorted(set(counts) | set(base)):
                n = counts.get(cat, 0)
                p = n / total
                q = float(base.get(cat, 0.0))
                rows.append([day, cat, n, total, p, q, term_fn(p, q)])
            psi_total = sum(abs(r[6]) for r in rows if r[6] is not None)
            yield _pd.DataFrame(
                {
                    "obs_day": [r[0] for r in rows],
                    "category": [r[1] for r in rows],
                    "n": [r[2] for r in rows],
                    "day_total": [r[3] for r in rows],
                    "share": [r[4] for r in rows],
                    "base_share": [r[5] for r in rows],
                    "psi_micronats": _pd.array(
                        [r[6] for r in rows], dtype="Int64"
                    ),
                    "drifted": psi_total >= alert,
                }
            )
            return

        for pdf in pdfs:
            vc = pdf[cat_col].value_counts(dropna=True)
            for cat, c in vc.items():
                counts[cat] = counts.get(cat, 0) + int(c)

        state.update((list(counts.keys()), list(counts.values())))
        state.setTimeoutTimestamp((int(key[0]) + 1) * day_ms)

    keyed = stream.withWatermark(ts_col, delay).select(
        F.col(ts_col),
        (F.unix_timestamp(F.date_trunc("DAY", F.col(ts_col))) / 86400)
        .cast("long")
        .alias("day_epoch"),
        F.col(cat_col).cast("string").alias(cat_col),
    )
    return keyed.groupBy("day_epoch").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
