"""Stateful streaming sessionization: sessions close when a later batch
proves the gap elapsed; open sessions persist in state across batches."""

import json
import os

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from sportstv_streaming_data_warehouse_spark.streaming.sessionize import (
    sessionize_stream,
)

EVENT_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("kind", StringType()),
    ]
)


def _drop(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for ts, uid in rows:
            f.write(json.dumps({"ts": ts, "user_id": uid, "kind": "e"}) + "\n")


def _run(spark, in_dir, out_dir, ckpt):
    stream = spark.readStream.schema(EVENT_SCHEMA).json(in_dir)
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .foreachBatch(
            lambda df, _e: df.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        rows = spark.read.parquet(out_dir).collect()
    except Exception:
        return []
    return sorted(
        (r["user_id"], r["session_start"].isoformat(), r["session_end"].isoformat(), r["n_events"])
        for r in rows
    )


def test_sessions_close_on_gap_within_batch(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    _drop(
        in_dir,
        "f1.json",
        [
            ("2024-05-01T10:00:00", 1),
            ("2024-05-01T10:10:00", 1),
            ("2024-05-01T12:00:00", 1),  # > 30 min after 10:10 → closes s1
            ("2024-05-01T09:00:00", 2),
        ],
    )
    out = _run(spark, in_dir, str(tmp_path / "out"), ckpt)
    # user 1's first session (2 events) is closed by the 12:00 event; the
    # watermark (12:00 - 1h) also passes user 2's timeout (09:30), so the
    # event-time timeout closes that lone-event session. user 1's 12:00
    # session stays open in state.
    assert out == [
        (1, "2024-05-01T10:00:00", "2024-05-01T10:10:00", 2),
        (2, "2024-05-01T09:00:00", "2024-05-01T09:00:00", 1),
    ]


def test_open_session_survives_restart_then_closes(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    _drop(in_dir, "f1.json", [("2024-05-01T10:00:00", 7), ("2024-05-01T10:05:00", 7)])
    out1 = _run(spark, in_dir, out_dir, ckpt)
    assert out1 == []  # still open: watermark (09:05) < timeout (10:35)

    # a later batch 2h on: proves the gap, closes the stored session
    _drop(in_dir, "f2.json", [("2024-05-01T12:00:00", 7)])
    out2 = _run(spark, in_dir, out_dir, ckpt)
    assert out2 == [(7, "2024-05-01T10:00:00", "2024-05-01T10:05:00", 2)]


def test_out_of_order_event_across_batches(spark, tmp_path):
    """A within-watermark event OLDER than the stored session end must not
    regress the open session: the closed session keeps its true end and
    counts the late event (interval-merge semantics == batch semantics)."""
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    _drop(in_dir, "f1.json", [("2024-05-01T10:00:00", 9), ("2024-05-01T10:20:00", 9)])
    assert _run(spark, in_dir, out_dir, ckpt) == []  # session open in state

    # batch 2: a late 10:10 event (watermark is 09:20 — still accepted)
    # plus a 12:30 event that proves the gap and closes the session
    _drop(
        in_dir,
        "f2.json",
        [("2024-05-01T10:10:00", 9), ("2024-05-01T12:30:00", 9)],
    )
    out = _run(spark, in_dir, out_dir, ckpt)
    assert out == [(9, "2024-05-01T10:00:00", "2024-05-01T10:20:00", 3)]


def test_late_event_extends_session_backwards(spark, tmp_path):
    """A late event within the gap BEFORE the stored start extends the
    session backwards instead of corrupting it."""
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    _drop(in_dir, "f1.json", [("2024-05-01T10:00:00", 3), ("2024-05-01T10:20:00", 3)])
    assert _run(spark, in_dir, out_dir, ckpt) == []

    _drop(
        in_dir,
        "f2.json",
        [("2024-05-01T09:45:00", 3), ("2024-05-01T13:00:00", 3)],
    )
    out = _run(spark, in_dir, out_dir, ckpt)
    assert out == [(3, "2024-05-01T09:45:00", "2024-05-01T10:20:00", 3)]


def test_streaming_sessions_match_batch_extents(spark, tmp_path):
    """Chain the stateful streaming operator to the oracle gate: stream
    the events FIXTURE through sessionize_stream, force every real
    session closed with per-user sentinel events in a second run, and
    full-hash-compare the emitted sessions against batch gap
    sessionization (the same lag+cumsum construction as the
    oracle-verified w_sessionize) over the identical drops."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sportstv_streaming_data_warehouse_spark.sources.fixtures import load_table

    from .parity import compare_frames

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select("ts", "user_id")
    in_dir = str(tmp_path / "in")
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    ev.select(F.date_format("ts", fmt).alias("ts"), "user_id").coalesce(
        2
    ).write.mode("overwrite").json(in_dir)

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run(spark, in_dir, out_dir, ckpt)  # real events; tails stay open

    # sentinel run: one far-future event per user exceeds every gap, so
    # the interval merge closes all real sessions; sentinel sessions
    # stay open in state and are never emitted
    mx = ev.agg(F.max("ts")).first()[0]
    sentinel_ts = (mx + dt.timedelta(hours=2)).strftime("%Y-%m-%dT%H:%M:%S.%f")
    ev.select("user_id").distinct().withColumn(
        "ts", F.lit(sentinel_ts)
    ).coalesce(1).write.mode("append").json(in_dir)
    _run(spark, in_dir, out_dir, ckpt)

    stream_sessions = spark.read.parquet(out_dir).select(
        "user_id", "session_start", "session_end", "n_events"
    )

    # batch twin over the SAME drops (minus sentinels): lag + running sum
    drops = (
        spark.read.schema(EVENT_SCHEMA).json(in_dir)
        .filter(F.col("ts") < F.lit(sentinel_ts).cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts").over(w)
    new_s = (
        prev.isNull() | ((F.col("ts").cast("long") - prev.cast("long")) > 1800)
    ).cast("int")
    batch_sessions = (
        drops.withColumn("s", F.sum(new_s).over(run))
        .groupBy("user_id", "s")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .drop("s")
    )
    compare_frames(stream_sessions, batch_sessions, "sessionize_stream_vs_batch")
