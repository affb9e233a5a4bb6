"""Streaming daily-KPI anomaly: finalized rows must be bit-equal to an
offline integer-arithmetic replay of the same day sequence (exact
milli-unit sums commute, so arrival order cannot change any emitted
value), and the planted anomaly day must flag."""

import json
import math
import os

from sportstv_streaming_data_warehouse_spark.streaming.anomaly import (
    daily_anomaly_stream,
)

MILLI = 1_000


def _drop(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, in_path, out_path, ckpt):
    stream = spark.readStream.schema(
        "event_type string, value double, ts timestamp"
    ).json(in_path)
    q = (
        daily_anomaly_stream(stream, delay="2 days", min_history_days=3)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _rows():
    # 'click': 6 steady days (~10.0) then a planted spike day (55.0);
    # 'view': steady throughout — must never flag
    rows = []
    for day in range(1, 7):
        for i in range(4):
            rows.append(
                {
                    "event_type": "click",
                    # within-day spread + DAY-TO-DAY variation (without
                    # it the history variance is exactly 0 and z stays
                    # NULL by contract)
                    "value": 10.0 + (i % 2) * 0.5 + (day % 3) * 0.2,
                    "ts": f"2024-06-{day:02d} 0{i + 1}:00:00",
                }
            )
            rows.append(
                {
                    "event_type": "view",
                    "value": 20.0 + (day % 3),
                    "ts": f"2024-06-{day:02d} 0{i + 1}:30:00",
                }
            )
    for i in range(4):
        rows.append(
            {
                "event_type": "click",
                "value": 55.0,
                "ts": f"2024-06-07 0{i + 1}:00:00",
            }
        )
        rows.append(
            {
                "event_type": "view",
                "value": 21.0,
                "ts": f"2024-06-07 0{i + 1}:30:00",
            }
        )
    return rows


def _replay(rows, min_hist=3, zt=3.0):
    """Offline replica of the exact integer-arithmetic contract."""
    per_key_day = {}
    for r in rows:
        k, d = r["event_type"], r["ts"][:10]
        n, s = per_key_day.setdefault(k, {}).setdefault(d, [0, 0])
        per_key_day[k][d] = [n + 1, s + round(r["value"] * MILLI)]
    out = {}
    for k, days in per_key_day.items():
        hd, hs, hq = 0, 0, 0
        for d in sorted(days):
            n, s = days[d]
            mean_milli = s // n if s >= 0 else -((-s) // n)
            z = None
            if hd >= min_hist:
                hm = hs / hd
                var = hq / hd - hm * hm
                if var > 0:
                    z = (mean_milli - hm) / math.sqrt(var)
            out[(k, d)] = (
                n,
                mean_milli / MILLI,
                hd,
                z,
                z is not None and abs(z) >= zt,
            )
            hd += 1
            hs += mean_milli
            hq += mean_milli * mean_milli
    return out


def test_stream_anomaly_bit_equal_to_replay(spark, tmp_path):
    in_path, out_path, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    rows = _rows()
    # shuffled multi-drop arrival: rows are reordered WITHIN each drop
    # (reversed — exercises order independence), while the cross-drop
    # split respects the 2-day watermark (days 1-4 fully in drop 1,
    # days 5-7 in drop 2): rows older than the watermark are dropped by
    # contract, so disorder wider than the delay is out of scope here
    early = [r for r in rows if r["ts"][:10] <= "2024-06-04"]
    late = [r for r in rows if r["ts"][:10] > "2024-06-04"]
    _drop(in_path, "b0.json", early[::-1])
    _run(spark, in_path, out_path, ckpt)
    _drop(in_path, "b1.json", late[::-1])
    _drop(in_path, "b2.json", [{"event_type": "wm", "value": 0.0, "ts": "2024-06-20 00:00:00"}])
    _run(spark, in_path, out_path, ckpt)

    got = {
        (r["event_type"], r["obs_day"].isoformat()): (
            r["day_n"],
            r["day_mean"],
            r["hist_days"],
            r["z_score"],
            r["is_anomaly"],
        )
        for r in spark.read.parquet(out_path).collect()
    }
    want = _replay(rows)
    assert set(got) == set(want)
    for key in want:
        gn, gm, gh, gz, ga = got[key]
        wn, wm, wh, wz, wa = want[key]
        assert (gn, gm, gh, ga) == (wn, wm, wh, wa), (key, got[key], want[key])
        assert gz == wz, (key, gz, wz)  # bit-equal doubles


def test_planted_spike_flags_and_steady_series_never_does(spark, tmp_path):
    want = _replay(_rows())
    click = {d: v for (k, d), v in want.items() if k == "click"}
    view = {d: v for (k, d), v in want.items() if k == "view"}
    # warm-up days carry no z; the spike day flags
    assert click["2024-06-07"][4] is True
    assert all(v[4] is False for d, v in click.items() if d != "2024-06-07")
    assert all(v[4] is False for v in view.values())
    # and the stream agreed with this replay bit-for-bit (previous test)
