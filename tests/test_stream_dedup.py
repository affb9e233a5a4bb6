"""Streaming dedup (dropDuplicatesWithinWatermark): first-arrival-wins
semantics across micro-batches, hash-parity with the batch exact dedup
on the same input — the same streaming↔batch chaining used for the
streaming fact."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from sportstv_streaming_data_warehouse_spark.streaming.dedup import dedup_stream

SCHEMA = StructType(
    [
        StructField("txn_id", LongType()),
        StructField("user_id", LongType()),
        StructField("sport", StringType()),
        StructField("minutes_streamed", IntegerType()),
        StructField("ts", TimestampType()),
    ]
)


def _drop(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, in_path, out_path, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(in_path)
    q = (
        dedup_stream(stream, ["txn_id"], ts_col="ts")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_duplicates_dropped_across_batches(spark, tmp_path):
    inp, outp, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    rows = [
        {"txn_id": i, "user_id": i % 5, "sport": "tennis",
         "minutes_streamed": 10 + i, "ts": f"2024-03-01T12:{i:02d}:00"}
        for i in range(20)
    ]
    _drop(inp, "d1.json", rows)
    _run(spark, inp, outp, ckpt)
    # replayed duplicates (same txn_id, later arrival) + some new rows
    dupes = [dict(r, minutes_streamed=999) for r in rows[:10]]
    fresh = [
        {"txn_id": 100 + i, "user_id": i, "sport": "tennis",
         "minutes_streamed": 50, "ts": f"2024-03-01T13:{i:02d}:00"}
        for i in range(3)
    ]
    _drop(inp, "d2.json", dupes + fresh)
    _run(spark, inp, outp, ckpt)

    out = spark.read.parquet(outp)
    got = {r["txn_id"]: r["minutes_streamed"] for r in out.collect()}
    # one row per txn_id, and the FIRST arrival's payload won
    assert len(got) == 23
    for i in range(20):
        assert got[i] == 10 + i  # not 999 — the replay was dropped
    assert all(got[100 + i] == 50 for i in range(3))


def test_stream_matches_batch_exact_dedup(spark, tmp_path):
    """Same input through the stream and through the batch exact dedup:
    identical surviving key sets (the streaming↔batch hash chain)."""
    from sportstv_streaming_data_warehouse_spark.operators.dedup import exact_dedup

    inp, outp, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    rows = [
        {"txn_id": i % 7, "user_id": i, "sport": "golf",
         "minutes_streamed": i, "ts": f"2024-03-01T12:{i:02d}:00"}
        for i in range(25)
    ]
    _drop(inp, "d.json", rows)
    _run(spark, inp, outp, ckpt)
    stream_keys = {
        r["txn_id"] for r in spark.read.parquet(outp).collect()
    }
    batch = spark.createDataFrame(
        [(r["txn_id"],) for r in rows], "txn_id long"
    ).withColumn("row_id", F.monotonically_increasing_id())
    batch_keys = {
        r["txn_id"]
        for r in exact_dedup(batch, ["txn_id"], "row_id").collect()
    }
    assert stream_keys == batch_keys == set(range(7))
