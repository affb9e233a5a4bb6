"""Streaming rolling 7-day distinct users: append-mode finalized rows
must equal the batch contribution-explode algebra
(w_rolling_distinct_7d) on the same input — the streaming↔batch parity
chain used across the streaming modules.

Append mode only FINALIZES a day once the watermark passes it, so the
test feeds a late high-watermark row whose only purpose is to advance
event time beyond every asserted day.
"""

import json
import os

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.streaming.rolling_distinct import (
    rolling_distinct_users_stream,
)


def _drop(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, in_path, out_path, ckpt, window_days=7):
    stream = spark.readStream.schema("user_id long, ts timestamp").json(
        in_path
    )
    q = (
        rolling_distinct_users_stream(
            stream, window_days=window_days, delay_days=1
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _batch_model(spark, rows, window_days=7):
    ev = spark.createDataFrame(
        [(r["user_id"], r["ts"]) for r in rows], "user_id long, ts string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    contrib = du.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add("d", window_days - 1))
        ).alias("obs_day"),
        "user_id",
    )
    return {
        r["obs_day"].isoformat(): r["n"]
        for r in contrib.groupBy("obs_day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }


def test_stream_matches_batch_on_planted_rows(spark, tmp_path):
    inp, outp, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    rows = [
        # user 1 on days 1 and 3 (must count ONCE in windows covering both)
        {"user_id": 1, "ts": "2024-01-01T10:00:00"},
        {"user_id": 1, "ts": "2024-01-03T10:00:00"},
        # user 2 on day 1, twice (intra-day dup)
        {"user_id": 2, "ts": "2024-01-01T11:00:00"},
        {"user_id": 2, "ts": "2024-01-01T12:00:00"},
        # user 3 on day 8
        {"user_id": 3, "ts": "2024-01-08T09:00:00"},
    ]
    # sentinel far in the future: advances the watermark past every
    # window above so append mode finalizes them
    sentinel = {"user_id": 999, "ts": "2024-03-01T00:00:00"}
    _drop(inp, "d1.json", rows)
    _run(spark, inp, outp, ckpt)
    _drop(inp, "d2.json", [sentinel])
    _run(spark, inp, outp, ckpt)

    got = {
        r["obs_day"].isoformat(): r["active_users"]
        for r in spark.read.parquet(outp).collect()
        # drop the sentinel's own (possibly not-yet-final) windows
        if r["obs_day"].isoformat() < "2024-02-20"
    }
    model = _batch_model(spark, rows)
    finalized_model = {d: n for d, n in model.items() if d < "2024-02-20"}
    assert got == finalized_model
    # spot semantics: day 3 window [already contains user1 (from day 1
    # AND day 3 — once) and user2]
    assert got["2024-01-03"] == 2
    # day 8: user1's day-3 contribution still inside [2..8]; user3 joins
    assert got["2024-01-08"] == 2
    # day 14: only user 3's window still open
    assert got["2024-01-14"] == 1


def test_stream_is_idempotent_under_replay(spark, tmp_path):
    inp, outp, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    rows = [
        {"user_id": u, "ts": f"2024-01-0{d}T10:00:00"}
        for u in (1, 2) for d in (1, 2)
    ]
    _drop(inp, "d1.json", rows)
    _run(spark, inp, outp, ckpt)
    # same rows again in a new file: duplicates within the watermark are
    # state-dropped, counts unchanged after finalization
    _drop(inp, "d2.json", rows)
    _run(spark, inp, outp, ckpt)
    _drop(inp, "d3.json", [{"user_id": 999, "ts": "2024-03-01T00:00:00"}])
    _run(spark, inp, outp, ckpt)
    got = {
        r["obs_day"].isoformat(): r["active_users"]
        for r in spark.read.parquet(outp).collect()
    }
    assert got["2024-01-01"] == 2
    assert got["2024-01-02"] == 2  # users 1,2 counted once each
    assert got["2024-01-08"] == 2  # day-2 contributions end day 8
    assert "2024-01-09" not in got  # nothing contributes past day 2+6


def test_cross_batch_same_day_users_both_count(spark, tmp_path):
    """Regression (round-5 review finding): an ON-TIME event for day D
    arriving in a LATER micro-batch than another day-D event must still
    count — the watermark delay must compensate for the explode shift
    (obs_ts runs up to window_days-1 ahead of event time)."""
    inp, outp, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    _drop(inp, "d1.json", [{"user_id": 1, "ts": "2024-01-05T10:00:00"}])
    _run(spark, inp, outp, ckpt)
    # batch 2: ANOTHER user, same day, zero lateness
    _drop(inp, "d2.json", [{"user_id": 2, "ts": "2024-01-05T11:00:00"}])
    _run(spark, inp, outp, ckpt)
    _drop(inp, "d3.json", [{"user_id": 999, "ts": "2024-03-01T00:00:00"}])
    _run(spark, inp, outp, ckpt)
    got = {
        r["obs_day"].isoformat(): r["active_users"]
        for r in spark.read.parquet(outp).collect()
    }
    # every window covering Jan 5 must see BOTH users
    for d in range(5, 12):
        assert got[f"2024-01-{d:02d}"] == 2, (d, got)


def test_catalog_grain_matches_the_stream_batch_model(spark):
    """Transitive-oracle closure (round-9 verdict task 5): the catalog
    entry s_rolling_distinct_grain must compute EXACTLY the algebra
    _batch_model pins the stream against — same contribution explode,
    same dedup, no observed-day restriction — so the driver's DuckDB
    gate on the catalog entry verifies the stream's output grain."""
    from sportstv_streaming_data_warehouse_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        r["obs_day"]: r["active_users"]
        for r in QUERIES["s_rolling_distinct_grain"](spark, sf).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet")
    rows = [
        {"user_id": r["user_id"], "ts": str(r["ts"])}
        for r in ev.select("user_id", "ts").collect()
    ]
    assert got == _batch_model(spark, rows)
