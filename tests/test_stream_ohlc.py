"""Streaming OHLC: append-mode finalized bars must match the batch
w_daily_ohlc algebra on the same rows — including out-of-ORDER arrival
across micro-batches, which is exactly the case first()/last() would
get wrong and the struct-argmin trick gets right."""

import json
import os

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.streaming.ohlc import (
    daily_ohlc_stream,
)


def _drop(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, in_path, out_path, ckpt):
    stream = spark.readStream.schema(
        "event_id long, event_type string, ts timestamp, value double"
    ).json(in_path)
    q = (
        daily_ohlc_stream(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_bar_matches_batch_despite_arrival_order(spark, tmp_path):
    inp, outp, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    # batch 1 delivers the LATER events first; batch 2 back-fills the
    # true day-open (still inside the watermark) — the finalized bar
    # must open at 09:00's value, not at whatever arrived first
    _drop(inp, "d1.json", [
        {"event_id": 3, "event_type": "click", "ts": "2024-01-05T15:00:00", "value": 1.0},
        {"event_id": 4, "event_type": "click", "ts": "2024-01-05T18:00:00", "value": 7.0},
    ])
    _run(spark, inp, outp, ckpt)
    _drop(inp, "d2.json", [
        {"event_id": 1, "event_type": "click", "ts": "2024-01-05T09:00:00", "value": 5.0},
        {"event_id": 2, "event_type": "click", "ts": "2024-01-05T12:00:00", "value": 9.0},
    ])
    _run(spark, inp, outp, ckpt)
    # sentinel advances the watermark so Jan 5 finalizes
    _drop(inp, "d3.json", [
        {"event_id": 99, "event_type": "view", "ts": "2024-02-01T00:00:00", "value": 0.0},
    ])
    _run(spark, inp, outp, ckpt)

    bars = {
        (r["event_type"], r["d"].isoformat()): r
        for r in spark.read.parquet(outp).collect()
    }
    bar = bars[("click", "2024-01-05")]
    assert bar["open_value"] == 5.0    # 09:00, delivered LAST
    assert bar["close_value"] == 7.0   # 18:00, delivered FIRST
    assert bar["high_value"] == 9.0 and bar["low_value"] == 1.0
    assert bar["n_events"] == 4


def test_stream_bars_agree_with_batch_query_shape(spark, tmp_path):
    from sportstv_streaming_data_warehouse_spark.plans.catalog import QUERIES

    # column contract matches the batch twin (names + dtypes), so
    # downstream consumers can swap sources
    batch = QUERIES["w_daily_ohlc"](spark, "/root/testdata/sf0.001")
    stream_schema = daily_ohlc_stream(
        spark.readStream.schema(
            "event_id long, event_type string, ts timestamp, value double"
        ).json(str(tmp_path))
    ).schema
    batch_cols = {f.name: f.dataType.simpleString() for f in batch.schema.fields}
    stream_cols = {f.name: f.dataType.simpleString() for f in stream_schema.fields}
    # the batch twin renders d as a display string; the stream keeps DATE
    assert set(batch_cols) == set(stream_cols)
    for c in batch_cols:
        if c != "d":
            assert batch_cols[c] == stream_cols[c], c
