"""Structured Streaming ingestion tests: availableNow processing, late
event-time data across restarts, and sink idempotency (SURVEY.md §2.10)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.streaming import ingest


def _write_drop(path: str, name: str, rows: list[dict]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


DAY1 = "2024-03-01"
DAY2 = "2024-03-02"


def _rows_day(day: str, n: int, sport: str, start_uid: int = 0) -> list[dict]:
    return [
        {
            "ts": f"{day}T{10 + (i % 10):02d}:00:00",
            "user_id": start_uid + i,
            "sport": sport,
            "minutes_streamed": 10,
            "completed": i % 2,
        }
        for i in range(n)
    ]


@pytest.fixture
def paths(tmp_path):
    return {
        "in": str(tmp_path / "drops"),
        "out": str(tmp_path / "fact"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _fact(spark, out_path):
    return {
        (r["day"].isoformat(), r["sport"]): r.asDict()
        for r in spark.read.parquet(out_path).collect()
    }


def test_available_now_rollup(spark, paths):
    _write_drop(paths["in"], "f1.json", _rows_day(DAY1, 20, "Ice Hockey") + _rows_day(DAY2, 5, "Ski Jumping"))
    ingest.run_available_data(spark, paths["in"], paths["out"], paths["ckpt"])

    fact = _fact(spark, paths["out"])
    assert fact[(DAY1, "Ice Hockey")]["transaction_count"] == 20
    assert fact[(DAY1, "Ice Hockey")]["total_minutes_streamed"] == 200
    assert fact[(DAY1, "Ice Hockey")]["completed_streams"] == 10
    assert fact[(DAY2, "Ski Jumping")]["transaction_count"] == 5
    # HLL estimate of 20 distinct users is near-exact at this cardinality
    assert abs(fact[(DAY1, "Ice Hockey")]["unique_user_estimate"] - 20) <= 2


def test_late_data_updates_prior_window(spark, paths):
    _write_drop(paths["in"], "f1.json", _rows_day(DAY1, 10, "Ice Hockey") + _rows_day(DAY2, 4, "Ice Hockey"))
    ingest.run_available_data(spark, paths["in"], paths["out"], paths["ckpt"])
    assert _fact(spark, paths["out"])[(DAY1, "Ice Hockey")]["transaction_count"] == 10

    # a late DAY1 event arrives after DAY2 data — within the 2-day
    # watermark, so the DAY1 window must update on restart
    _write_drop(paths["in"], "f2.json", _rows_day(DAY1, 3, "Ice Hockey", start_uid=100))
    ingest.run_available_data(spark, paths["in"], paths["out"], paths["ckpt"])

    fact = _fact(spark, paths["out"])
    assert fact[(DAY1, "Ice Hockey")]["transaction_count"] == 13
    assert fact[(DAY2, "Ice Hockey")]["transaction_count"] == 4


def test_streaming_batch_parity_on_events_fixture(spark):
    """The streaming rollup over the real events table must equal the
    batch groupBy — same engine, two execution modes (SURVEY §2.10)."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType, TimestampType,
    )

    from sportstv_streaming_data_warehouse_spark.sources.fixtures import load_table

    from .conftest import SF001

    import tempfile

    # Round-trip the fixture through load_table's ts normalization so the
    # stream source sees a plain TIMESTAMP column regardless of how the
    # installed Spark maps the original TIMESTAMP(NANOS) fixture (long
    # under the legacy shim on older readers, TIMESTAMP_NTZ natively on
    # newer ones). The file stream source requires a directory.
    events_dir = tempfile.mkdtemp(prefix="events-stream-")
    load_table(spark, SF001, "events").write.mode("overwrite").parquet(events_dir)

    raw_schema = StructType([
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ])
    stream = spark.readStream.schema(raw_schema).parquet(events_dir)
    rollup = (
        stream.withWatermark("ts", "2 days")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.to_date("w.start").alias("day"), "event_type", "n")
    )
    q = (
        rollup.writeStream.outputMode("complete")
        .format("memory")
        .queryName("events_rollup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["day"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM events_rollup").collect()
    }
    spark.catalog.dropTempView("events_rollup")
    expected = {
        (r["day"], r["event_type"]): r["n"]
        for r in load_table(spark, SF001, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == expected


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """At-least-once sources replay events; dropDuplicatesWithinWatermark
    on the event id makes the rollup effectively-once without unbounded
    state (dedup state evicts with the watermark)."""
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType, TimestampType,
    )

    in_dir = str(tmp_path / "in")
    schema = StructType([
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("sport", StringType()),
        StructField("minutes_streamed", IntegerType()),
    ])
    rows = [
        {"event_id": i, "ts": f"2024-03-01T10:{i:02d}:00", "sport": "Ice Hockey",
         "minutes_streamed": 10}
        for i in range(10)
    ]
    # the same 10 events delivered twice (plus an extra duplicate of id 0)
    _write_drop(in_dir, "f1.json", rows)
    _write_drop(in_dir, "f2.json", rows + [rows[0]])

    stream = (
        spark.readStream.schema(schema).json(in_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    agg = stream.groupBy("sport").agg(
        F.count("*").alias("n"),
        F.sum("minutes_streamed").cast("long").alias("minutes"),
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("dedup_rollup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM dedup_rollup").collect()
    spark.catalog.dropTempView("dedup_rollup")
    assert len(out) == 1
    assert out[0]["n"] == 10 and out[0]["minutes"] == 100  # replays ignored


def test_restart_without_new_data_is_idempotent(spark, paths):
    _write_drop(paths["in"], "f1.json", _rows_day(DAY1, 8, "Ski Jumping"))
    ingest.run_available_data(spark, paths["in"], paths["out"], paths["ckpt"])
    before = _fact(spark, paths["out"])

    ingest.run_available_data(spark, paths["in"], paths["out"], paths["ckpt"])
    after = _fact(spark, paths["out"])
    assert before == after


def test_sink_swap_crash_recovery(spark, paths):
    """A crash between the swap renames must never lose the sink: a
    complete staging dir is rolled forward, an intact retired dir is
    rolled back, and the replayed micro-batch re-merges idempotently."""
    import shutil

    _write_drop(paths["in"], "f1.json", _rows_day(DAY1, 10, "Biathlon"))
    ingest.run_available_data(spark, paths["in"], paths["out"], paths["ckpt"])
    before = _fact(spark, paths["out"])

    # crash window A: sink renamed aside, staging (complete) not yet in
    base = paths["out"].rstrip("/")
    os.rename(base, base + "__old")
    shutil.copytree(base + "__old", base + "__staging")
    _write_drop(paths["in"], "f2.json", _rows_day(DAY2, 4, "Biathlon"))
    ingest.run_available_data(spark, paths["in"], paths["out"], paths["ckpt"])
    fact = _fact(spark, paths["out"])
    assert fact[(DAY1, "Biathlon")]["transaction_count"] == 10  # not lost
    assert fact[(DAY2, "Biathlon")]["transaction_count"] == 4
    assert not os.path.isdir(base + "__old")
    assert not os.path.isdir(base + "__staging")

    # crash window B: sink renamed aside, staging incomplete (no _SUCCESS)
    os.rename(base, base + "__old")
    os.makedirs(base + "__staging")  # torn write: empty, no _SUCCESS
    _write_drop(paths["in"], "f3.json", _rows_day(DAY2, 3, "Curling", start_uid=100))
    ingest.run_available_data(spark, paths["in"], paths["out"], paths["ckpt"])
    fact = _fact(spark, paths["out"])
    assert fact[(DAY1, "Biathlon")]["transaction_count"] == 10  # rolled back
    assert fact[(DAY2, "Curling")]["transaction_count"] == 3
    assert before.keys() <= fact.keys()
