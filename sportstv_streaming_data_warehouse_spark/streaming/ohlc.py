"""Streaming daily OHLC bars — the streaming twin of the w_daily_ohlc
catalog query, with the identical struct-argmin/argmax algebra.

open/close need the value at the earliest/latest (ts, event_id) in each
window — an ORDER-dependent pick that streaming aggregation cannot
express with first()/last() (micro-batch arrival order is not event
order). The batch query's trick carries over unchanged: min/max over a
(ts, event_id, value) struct is a plain associative aggregate, so it
composes with windowed streaming aggregation and watermark-driven
append-mode finalization. One stateful operator; state is one partial
bar per open (type, day) window, evicted by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_ohlc_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    delay: str = "1 day",
) -> DataFrame:
    """Append-mode (event_type, day) OHLC bars finalized as the
    watermark passes each day."""
    return (
        stream.withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, "1 day").alias("w"), type_col)
        .agg(
            F.min(F.struct(ts_col, id_col, value_col)).alias("__first"),
            F.max(F.struct(ts_col, id_col, value_col)).alias("__last"),
            F.max(value_col).alias("high_value"),
            F.min(value_col).alias("low_value"),
            F.count("*").alias("n_events"),
        )
        .select(
            type_col,
            F.to_date(F.col("w.start")).alias("d"),
            F.col(f"__first.{value_col}").alias("open_value"),
            "high_value",
            "low_value",
            F.col(f"__last.{value_col}").alias("close_value"),
            "n_events",
        )
    )
