"""Streaming Misra-Gries heavy hitters — the streaming twin of the
batch ``x_heavy_hitters`` catalog operator (operators/sketches.py).

The batch operator is two-round: bounded per-partition MG summaries,
then an exact recount of the candidate union. A stream cannot make the
second pass (the raw rows are gone), so the streaming twin emits the
FIRST round's mergeable summary as each day finalizes: per (day, shard)
Misra-Gries counters maintained in ``applyInPandasWithState`` state and
flushed once the watermark passes the day's end.

Output rows carry the MG guarantee, not exact counts:

- ``count_lb`` is the surviving counter — a LOWER bound on the item's
  true count, and at least ``true_count − n_shard/k`` (Misra-Gries
  bound), so every item with true shard count > n_shard/k is emitted;
- sharding is BY ITEM HASH, so all copies of an item land in one shard
  and the per-shard guarantee lifts to the global threshold: any item
  with global day count > n_day/k is emitted by its shard (its shard
  count equals its global count and n_shard ≤ n_day);
- ``n_items`` is the shard's exact row total; summing it over a day's
  shards reconstructs n_day, so a downstream batch filter
  ``count_lb + n_shard/k > n_day/k`` (or an exact recount against the
  archived raw stream) applies any final threshold — mirroring the
  batch twin's second round.

Scale posture: state is ≤ k counters per (day, shard) group — bounded
by k × shards × watermark-horizon days, never by stream history or
vocabulary size — and the grouped shuffle spreads each day over
``n_shards`` tasks instead of one hot partition per day.

Parity (tests/test_stream_heavy_hitters.py): superset-of-true-heavy-
hitters and counter-bound guarantees against an exact batch count over
the same rows, under out-of-order arrival.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DateType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DAY_MS = 86_400_000

STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n_items", LongType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("obs_day", DateType()),
        StructField("shard", IntegerType()),
        StructField("item", StringType()),
        StructField("count_lb", LongType()),
        StructField("n_items", LongType()),
    ]
)


def heavy_hitters_stream(
    stream: DataFrame,
    item_col: str = "item",
    ts_col: str = "ts",
    k: int = 64,
    n_shards: int = 8,
    delay: str = "1 day",
) -> DataFrame:
    """stream(ts, item) → append-mode per-day Misra-Gries summaries.

    One finalized batch of rows per (day, shard) when the watermark
    passes the day: (obs_day, shard, item, count_lb, n_items). A shard
    whose summary compressed to empty emits one sentinel row with item
    NULL so its n_items is never lost.
    """
    from ..operators.sketches import make_merge_compress

    day_ms = DAY_MS
    mc = make_merge_compress(k)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        counters: dict[str, int] = {}
        n_items = 0
        if state.exists:
            items, counts, n_items = state.get
            counters = dict(zip(items, counts))

        if state.hasTimedOut:
            # the watermark passed the day's end: flush and drop state.
            # A compress can legally EMPTY the counters (all-distinct
            # uniform input: nothing exceeds n/k) — emit a single
            # sentinel row (item NULL, count_lb 0) so the shard's exact
            # n_items still reaches the output and the documented
            # day-total reconstruction never loses a shard.
            day_epoch, shard = int(key[0]), int(key[1])
            state.remove()
            if n_items > 0:
                items = list(counters.keys()) or [None]
                lbs = list(counters.values()) or [0]
                yield _pd.DataFrame(
                    {
                        "obs_day": [
                            _pd.Timestamp(day_epoch * day_ms, unit="ms").date()
                        ]
                        * len(items),
                        "shard": shard,
                        "item": _pd.Series(items, dtype="object"),
                        "count_lb": lbs,
                        "n_items": n_items,
                    }
                )
            return

        # vectorized MG merge-compress — the ONE shared implementation
        # (operators/sketches.make_merge_compress, captured by value at
        # job build time so executors need no package import)
        for pdf in pdfs:
            vc = pdf[item_col].value_counts(dropna=True)
            n_items += int(vc.sum())
            counters = mc(counters, vc.items())

        state.update(
            (list(counters.keys()), list(counters.values()), n_items)
        )
        # fire when the watermark passes the END of this group's day
        state.setTimeoutTimestamp((int(key[0]) + 1) * day_ms)

    keyed = stream.withWatermark(ts_col, delay).select(
        F.col(ts_col),  # the watermark column must survive the projection
        (
            F.unix_timestamp(F.date_trunc("DAY", F.col(ts_col))) / 86400
        )
        .cast("long")
        .alias("day_epoch"),
        (F.abs(F.crc32(F.col(item_col).cast("string"))) % n_shards)
        .cast("int")
        .alias("shard"),
        F.col(item_col).cast("string").alias(item_col),
    )
    return keyed.groupBy("day_epoch", "shard").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
