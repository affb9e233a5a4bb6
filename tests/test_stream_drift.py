"""Streaming PSI drift: finalized per-day rows must be BIT-EQUAL to the
batch computation over the same rows — exact counts commute, so unlike
the MG twin the parity here is full value equality, under shuffled
multi-drop arrival."""

import json
import math
import os

from sportstv_streaming_data_warehouse_spark.streaming.drift import (
    distribution_drift_stream,
    psi_micronats,
)

BASELINE = {"view": 0.4, "click": 0.3, "purchase": 0.2, "error": 0.1}


def _drop(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, in_path, out_path, ckpt):
    stream = spark.readStream.schema("event_type string, ts timestamp").json(
        in_path
    )
    q = (
        # the test's disorder spans a full day (day-2 rows arrive in the
        # same drop as half of day 1), so the lateness tolerance must
        # cover it — rows older than the watermark are dropped by
        # contract, which delay="1 day" would (correctly) do here
        distribution_drift_stream(stream, BASELINE, delay="2 days")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _rows():
    # day 1 matches the baseline closely (40/30/20/10 of 100);
    # day 2 is heavily drifted (error storm: 60 of 80 events)
    day1 = (
        [{"event_type": "view", "ts": f"2024-04-01 01:00:{i % 60:02d}"} for i in range(40)]
        + [{"event_type": "click", "ts": f"2024-04-01 02:00:{i % 60:02d}"} for i in range(30)]
        + [{"event_type": "purchase", "ts": f"2024-04-01 03:00:{i % 60:02d}"} for i in range(20)]
        + [{"event_type": "error", "ts": f"2024-04-01 04:00:{i % 60:02d}"} for i in range(10)]
    )
    day2 = (
        [{"event_type": "error", "ts": f"2024-04-02 01:00:{i % 60:02d}"} for i in range(60)]
        + [{"event_type": "view", "ts": f"2024-04-02 02:00:{i % 60:02d}"} for i in range(20)]
    )
    return day1, day2


def _batch_model(rows):
    """Exact per-day PSI rows via the same formula the batch catalog
    query uses — the ground truth the stream must equal bit-for-bit."""
    days = {}
    for r in rows:
        d = r["ts"][:10]
        days.setdefault(d, {}).setdefault(r["event_type"], 0)
        days[d][r["event_type"]] += 1
    out = {}
    for d, counts in days.items():
        total = sum(counts.values())
        rows_d = {}
        for cat in sorted(set(counts) | set(BASELINE)):
            n = counts.get(cat, 0)
            p, q = n / total, BASELINE.get(cat, 0.0)
            rows_d[cat] = (n, total, p, q, psi_micronats(p, q))
        psi_total = sum(
            abs(t[4]) for t in rows_d.values() if t[4] is not None
        )
        out[d] = (rows_d, psi_total >= 100_000)
    return out


def test_stream_drift_bit_equal_to_batch(spark, tmp_path):
    in_path, out_path, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    day1, day2 = _rows()
    rows = day1 + day2
    # shuffled multi-drop arrival: interleave days across two drops
    _drop(in_path, "b0.json", rows[::2])
    _run(spark, in_path, out_path, ckpt)
    _drop(in_path, "b1.json", rows[1::2])
    _drop(in_path, "b2.json", [{"event_type": "wm", "ts": "2024-04-10 00:00:00"}])
    _run(spark, in_path, out_path, ckpt)

    got = {
        (r["obs_day"].isoformat(), r["category"]): r
        for r in spark.read.parquet(out_path).collect()
    }
    want = _batch_model(rows)
    for d, (cats, drifted) in want.items():
        for cat, (n, total, p, q, term) in cats.items():
            r = got[(d, cat)]
            assert r["n"] == n and r["day_total"] == total
            assert r["share"] == p and r["base_share"] == q
            assert r["psi_micronats"] == term
            assert r["drifted"] == drifted
    # no extra rows beyond the expected day x category grid
    assert len(got) == sum(len(c) for c, _ in want.values())


def test_drift_flags(spark, tmp_path):
    day1, day2 = _rows()
    want = _batch_model(day1 + day2)
    # the construction really does separate the two days
    assert want["2024-04-01"][1] is False  # near-baseline: no alert
    assert want["2024-04-02"][1] is True   # error storm: alert


def test_vanished_category_emits_zero_row(spark, tmp_path):
    # 'purchase' and 'click' never arrive on day 2 -> rows with n=0,
    # base_share>0, NULL psi term (the batch query's zero guard)
    in_path, out_path, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    _, day2 = _rows()
    _drop(in_path, "b0.json", day2)
    _drop(in_path, "b1.json", [{"event_type": "wm", "ts": "2024-04-10 00:00:00"}])
    _run(spark, in_path, out_path, ckpt)
    got = {
        r["category"]: r
        for r in spark.read.parquet(out_path)
        .filter("obs_day = DATE'2024-04-02'")
        .collect()
    }
    assert got["purchase"]["n"] == 0
    assert got["purchase"]["psi_micronats"] is None
    assert got["purchase"]["base_share"] == 0.2
    assert math.isclose(got["error"]["share"], 0.75)
