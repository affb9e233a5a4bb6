"""Streaming LOCF: append-mode finalized daily rows must match the batch
forward_fill algebra on the same rows — including out-of-order arrival
across micro-batches (a cross-batch row inside the watermark lands in
the right day's sum before that day finalizes) and gap days for a series
with NO rows in any batch (the case windowed aggregation cannot emit and
only per-key state can)."""

import json
import os

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.operators.windows import (
    forward_fill,
)
from sportstv_streaming_data_warehouse_spark.streaming.forward_fill import (
    forward_fill_stream,
)


def _drop(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, in_path, out_path, ckpt):
    stream = spark.readStream.schema(
        "series_id string, ts timestamp, value double"
    ).json(in_path)
    q = (
        forward_fill_stream(stream, series_cols=("series_id",))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _finalized(spark, outp):
    return {
        (r["series_id"], r["d"].isoformat()): (
            r["filled_value"],
            r["is_filled"],
        )
        for r in spark.read.parquet(outp).collect()
    }


def test_stream_locf_matches_batch_despite_arrival_order(spark, tmp_path):
    inp, outp, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    # batch 1: A observed Jan 1, Jan 4 (06:00) and Jan 5; B Jan 2 only.
    # Watermark after batch 1 = Jan 5 12:00 - 1d = Jan 4 12:00.
    _drop(inp, "b1.json", [
        {"series_id": "A", "ts": "2024-01-01T10:00:00", "value": 2.5},
        {"series_id": "A", "ts": "2024-01-04T06:00:00", "value": 3.0},
        {"series_id": "A", "ts": "2024-01-05T12:00:00", "value": 7.0},
        {"series_id": "B", "ts": "2024-01-02T09:00:00", "value": 4.0},
    ])
    _run(spark, inp, outp, ckpt)
    # batch 2: an OUT-OF-ORDER Jan 4 row (18:00 — newer than the Jan 4
    # 12:00 watermark, older than the Jan 5 row batch 1 delivered). It
    # must fold into Jan 4's pending sum before that day finalizes.
    _drop(inp, "b2.json", [
        {"series_id": "A", "ts": "2024-01-04T18:00:00", "value": 1.0},
    ])
    _run(spark, inp, outp, ckpt)
    # sentinel advances the watermark so everything through Jan 5 finals
    _drop(inp, "b3.json", [
        {"series_id": "C", "ts": "2024-02-01T00:00:00", "value": 0.0},
    ])
    _run(spark, inp, outp, ckpt)

    got = _finalized(spark, outp)
    assert got[("A", "2024-01-01")] == (2.5, False)
    assert got[("A", "2024-01-02")] == (2.5, True)
    assert got[("A", "2024-01-03")] == (2.5, True)
    # both batches' Jan 4 rows summed: 3.0 + 1.0
    assert got[("A", "2024-01-04")] == (4.0, False)
    assert got[("A", "2024-01-05")] == (7.0, False)
    # series B: single observation, NO trailing fills past its last day
    assert got[("B", "2024-01-02")] == (4.0, False)
    assert ("B", "2024-01-03") not in got
    # series C is still inside the watermark — not finalized yet
    assert all(k[0] != "C" for k in got)


def test_stream_gap_days_emitted_with_no_rows_in_any_batch(spark, tmp_path):
    """The defining LOCF case: days with ZERO input rows anywhere still
    produce output rows once the watermark passes them — via the
    event-time timeout path, with no new data for the series at all."""
    inp, outp, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    _drop(inp, "b1.json", [
        {"series_id": "A", "ts": "2024-01-01T00:00:00", "value": 3.0},
        {"series_id": "A", "ts": "2024-01-04T00:00:00", "value": 9.0},
    ])
    _run(spark, inp, outp, ckpt)
    # watermark sentinel on a DIFFERENT series: series A's Jan 2-3 gap
    # rows can only come from its state, not from any input row
    _drop(inp, "b2.json", [
        {"series_id": "Z", "ts": "2024-03-01T00:00:00", "value": 0.0},
    ])
    _run(spark, inp, outp, ckpt)

    got = _finalized(spark, outp)
    assert got[("A", "2024-01-01")] == (3.0, False)
    assert got[("A", "2024-01-02")] == (3.0, True)
    assert got[("A", "2024-01-03")] == (3.0, True)
    assert got[("A", "2024-01-04")] == (9.0, False)


def test_stream_matches_batch_operator_on_same_rows(spark, tmp_path):
    """Algebra parity: finalized streaming rows == the batch
    forward_fill operator on the same rows, with the batch spine
    restricted to the streaming contract (per-series days between first
    and last observation; global spine days outside a series' observed
    range are the documented semantic difference)."""
    inp, outp, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    rows = [
        {"series_id": "A", "ts": "2024-01-01T05:00:00", "value": 1.25},
        {"series_id": "A", "ts": "2024-01-01T06:00:00", "value": 0.75},
        {"series_id": "A", "ts": "2024-01-03T07:00:00", "value": 2.0},
        {"series_id": "A", "ts": "2024-01-06T01:00:00", "value": 5.5},
        {"series_id": "B", "ts": "2024-01-02T00:00:00", "value": 8.0},
        {"series_id": "B", "ts": "2024-01-05T00:00:00", "value": 6.0},
        {"series_id": "C", "ts": "2024-01-04T00:00:00", "value": 1.0},
    ]
    # shuffled across batches; batch 1's max ts (Jan 2 00:00) keeps the
    # watermark at Jan 1 00:00, so batch 2's Jan 1 05:00 row is still
    # inside the watermark despite arriving after a newer same-day row
    _drop(inp, "b1.json", [rows[1], rows[4]])
    _run(spark, inp, outp, ckpt)
    _drop(inp, "b2.json", [rows[0], rows[3], rows[6], rows[5], rows[2]])
    _run(spark, inp, outp, ckpt)
    _drop(inp, "b3.json", [
        {"series_id": "Z", "ts": "2024-03-01T00:00:00", "value": 0.0},
    ])
    _run(spark, inp, outp, ckpt)

    ev = spark.createDataFrame(
        [(r["series_id"], r["ts"], r["value"]) for r in rows],
        "series_id string, ts string, value double",
    ).select("series_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    daily = ev.groupBy("series_id", F.to_date("ts").alias("d")).agg(
        F.sum("value").alias("v")
    )
    days = ev.select(F.to_date("ts").alias("d")).distinct()
    bounds = daily.groupBy("series_id").agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    batch = (
        forward_fill(daily, ["series_id"], days)
        .join(bounds, "series_id")
        .where(F.col("d").between(F.col("lo"), F.col("hi")))
    )
    expect = {
        (r["series_id"], r["d"].isoformat()): (
            r["filled_value"],
            r["is_filled"],
        )
        for r in batch.collect()
    }
    got = {k: v for k, v in _finalized(spark, outp).items() if k[0] != "Z"}
    assert got == expect


def test_gap_days_emit_promptly_before_next_observation_finalizes(
    spark, tmp_path
):
    """Review finding: with the timeout aimed only at the next pending
    OBSERVATION, finalizable gap days stalled until that observation's
    day finalized. The timeout must target the first un-emitted day, so
    a watermark advance between two distant observations emits the
    elapsed gap days promptly."""
    inp, outp, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )

    def run(delay):
        stream = spark.readStream.schema(
            "series_id string, ts timestamp, value double"
        ).json(inp)
        q = (
            forward_fill_stream(stream, series_cols=("series_id",), delay=delay)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # A observes Jan 1 and Jan 11; the 5-day delay holds the watermark at
    # Jan 6 after batch 1, so days 1-5 finalize but Jan 11 stays pending
    _drop(inp, "b1.json", [
        {"series_id": "A", "ts": "2024-01-01T00:00:00", "value": 3.0},
        {"series_id": "A", "ts": "2024-01-11T00:00:00", "value": 9.0},
    ])
    run("5 days")
    # batch 2: ANOTHER series nudges the watermark to Jan 9 — A has no
    # new data, so only the (re-aimed) timeout can emit its gap days
    _drop(inp, "b2.json", [
        {"series_id": "B", "ts": "2024-01-14T00:00:00", "value": 0.0},
    ])
    run("5 days")

    got = _finalized(spark, outp)
    # days 6-7 are finalizable (watermark Jan 9 ⇒ final day Jan 8 — and
    # Jan 8 itself) and must ALREADY be out, well before Jan 11 finalizes
    for d in ("2024-01-06", "2024-01-07", "2024-01-08"):
        assert got[("A", d)] == (3.0, True), d
    assert ("A", "2024-01-11") not in got  # still pending, correctly


def _run_ttl(spark, in_path, out_path, ckpt, state_ttl):
    stream = spark.readStream.schema(
        "series_id string, ts timestamp, value double"
    ).json(in_path)
    q = (
        forward_fill_stream(
            stream, series_cols=("series_id",), state_ttl=state_ttl
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _ttl_scenario(spark, tmp_path, sub, state_ttl):
    """Series A observes Jan 1, goes dormant while sentinels advance the
    watermark, then observes again Feb 20. With eviction the dormancy
    gap must NOT backfill (the spine restarts); without it LOCF fills
    every interior day. Returns A's rows."""
    inp, outp, ckpt = (
        str(tmp_path / sub / "in"),
        str(tmp_path / sub / "out"),
        str(tmp_path / sub / "ckpt"),
    )
    _drop(inp, "b0.json", [
        {"series_id": "A", "ts": "2024-01-01 12:00:00", "value": 5.0},
        {"series_id": "W", "ts": "2024-01-03 00:00:00", "value": 1.0},
    ])
    _run_ttl(spark, inp, outp, ckpt, state_ttl)
    # prompt watermark step: A's Jan 1 flushes while the watermark is
    # still near the observation, so the dormancy clock anchors at
    # last_day + ttl (the steady-advancement case; a single giant jump
    # straight to Feb would legitimately defer eviction one batch)
    _drop(inp, "b0b.json", [
        {"series_id": "W", "ts": "2024-01-06 00:00:00", "value": 1.0},
    ])
    _run_ttl(spark, inp, outp, ckpt, state_ttl)
    # dormancy: sentinel-only batch pushes the watermark far past
    # (A's last activity + ttl) so A's slot times out with no data
    _drop(inp, "b1.json", [
        {"series_id": "W", "ts": "2024-02-15 00:00:00", "value": 1.0},
    ])
    _run_ttl(spark, inp, outp, ckpt, state_ttl)
    # A returns; a final sentinel finalizes the new observation
    _drop(inp, "b2.json", [
        {"series_id": "A", "ts": "2024-02-20 12:00:00", "value": 7.0},
    ])
    _run_ttl(spark, inp, outp, ckpt, state_ttl)
    _drop(inp, "b3.json", [
        {"series_id": "W", "ts": "2024-02-25 00:00:00", "value": 1.0},
    ])
    _run_ttl(spark, inp, outp, ckpt, state_ttl)
    return {
        r["d"].isoformat(): (r["filled_value"], r["is_filled"])
        for r in spark.read.parquet(outp).collect()
        if r["series_id"] == "A"
    }


def test_state_ttl_evicts_dormant_series_and_spine_restarts(
    spark, tmp_path
):
    """With a 10-day TTL the dormant slot is dropped: the dormancy gap
    is NOT backfilled and the returning observation restarts the spine
    — the explicit data-loss trade-off the docstring documents, proving
    the state was actually evicted."""
    got = _ttl_scenario(spark, tmp_path, "short", state_ttl="10 days")
    assert got["2024-01-01"] == (5.0, False)
    assert got["2024-02-20"] == (7.0, False)
    # no fills in the dormancy gap
    assert not any(
        "2024-01-01" < d < "2024-02-20" for d in got
    ), sorted(got)


def test_long_ttl_keeps_state_and_backfills_gap(spark, tmp_path):
    """Control: a TTL longer than the dormancy keeps the slot, so LOCF
    fills every interior day exactly as with state_ttl=None."""
    got = _ttl_scenario(spark, tmp_path, "long", state_ttl="300 days")
    assert got["2024-01-01"] == (5.0, False)
    assert got["2024-02-20"] == (7.0, False)
    assert got["2024-01-15"] == (5.0, True)
    assert got["2024-02-19"] == (5.0, True)
    # every interior day filled
    assert len(got) == (31 + 20)  # Jan 1..Feb 20 inclusive
