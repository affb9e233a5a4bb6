"""Streaming Misra-Gries heavy hitters: the finalized per-(day, shard)
summaries must satisfy the MG guarantees against an EXACT batch count of
the same rows — superset of true heavy hitters, counter lower/upper
bounds, exact shard totals — under out-of-order, multi-drop arrival.

(Counter VALUES are arrival-order dependent by design — MG is a lossy
summary — so the parity contract is the guarantee set, not bit-equal
counts; the batch twin x_heavy_hitters gets exactness from its second
recount pass, which a stream cannot make.)
"""

import json
import os

from sportstv_streaming_data_warehouse_spark.streaming.heavy_hitters import (
    heavy_hitters_stream,
)

K = 4
SHARDS = 2


def _drop(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, in_path, out_path, ckpt):
    stream = spark.readStream.schema("item string, ts timestamp").json(in_path)
    q = (
        heavy_hitters_stream(
            stream, item_col="item", k=K, n_shards=SHARDS, delay="1 day"
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _rows():
    # day 1: 'hot' 12x, 'warm' 5x, 8 singleton tail items (n=25)
    # true heavy hitters at k=4 (count > 25/4 = 6.25): {'hot'}
    day1 = (
        [{"item": "hot", "ts": f"2024-03-01 08:00:{s:02d}"} for s in range(12)]
        + [{"item": "warm", "ts": f"2024-03-01 09:00:{s:02d}"} for s in range(5)]
        + [
            {"item": f"t{i}", "ts": f"2024-03-01 10:00:{i:02d}"}
            for i in range(8)
        ]
    )
    # day 2: uniform 4x4 (n=16) — nothing above 16/4
    day2 = [
        {"item": c, "ts": f"2024-03-02 01:00:{s:02d}"}
        for c in ("a", "b", "c", "d")
        for s in range(4)
    ]
    return day1, day2


def test_stream_mg_guarantees_under_out_of_order_arrival(spark, tmp_path):
    in_path, out_path, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    day1, day2 = _rows()
    shuffled = day1[::2] + day2[:8]          # interleaved, gappy order
    late = day1[1::2] + day2[8:]             # rest arrives in drop 2
    _drop(in_path, "b0.json", shuffled)
    _run(spark, in_path, out_path, ckpt)
    _drop(in_path, "b1.json", late)
    # high-watermark row: advances event time past both days so their
    # per-(day, shard) groups time out and flush
    _drop(in_path, "b2.json", [{"item": "wm", "ts": "2024-03-10 00:00:00"}])
    _run(spark, in_path, out_path, ckpt)

    out = spark.read.parquet(out_path)
    emitted = {
        (r["obs_day"].isoformat(), r["item"]): r
        for r in out.collect()
    }

    # exact batch truth
    all_rows = day1 + day2
    truth = {}
    day_tot = {}
    for r in all_rows:
        d = r["ts"][:10]
        truth[(d, r["item"])] = truth.get((d, r["item"]), 0) + 1
        day_tot[d] = day_tot.get(d, 0) + 1

    # 1. superset guarantee: every item with count > n_day/K is emitted
    for (d, item), c in truth.items():
        if c > day_tot[d] / K:
            assert (d, item) in emitted, (d, item, c)

    # 2. counter bounds: count_lb <= true count, and within n_shard/K
    for (d, item), r in emitted.items():
        true_c = truth.get((d, item), 0)
        assert r["count_lb"] <= true_c
        assert r["count_lb"] >= true_c - r["n_items"] / K

    # 3. shard totals reconstruct day totals exactly
    # (n_items repeats per emitted row of a shard — dedup to per-shard)
    per_shard = {
        (r["obs_day"].isoformat(), r["shard"]): r["n_items"]
        for r in out.collect()
    }
    got_tot = {}
    for (d, _s), n in per_shard.items():
        got_tot[d] = got_tot.get(d, 0) + n
    for d, n in day_tot.items():
        assert got_tot[d] == n, (d, got_tot.get(d), n)

    # 4. bounded summaries: at most K items per (day, shard)
    sizes = (
        out.groupBy("obs_day", "shard").count().collect()
    )
    assert all(r["count"] <= K for r in sizes)


def test_stream_mg_is_idempotent_on_restart(spark, tmp_path):
    # re-running the same availableNow query over the same checkpoint
    # must not re-emit finalized days
    in_path, out_path, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    day1, _ = _rows()
    _drop(in_path, "b0.json", day1)
    _drop(in_path, "b1.json", [{"item": "wm", "ts": "2024-03-10 00:00:00"}])
    _run(spark, in_path, out_path, ckpt)
    n1 = spark.read.parquet(out_path).count()
    _run(spark, in_path, out_path, ckpt)  # no new input
    n2 = spark.read.parquet(out_path).count()
    assert n1 == n2


def test_stream_mg_compress_empty_shard_keeps_totals(spark, tmp_path):
    """All-distinct uniform input can legally compress a shard's summary
    to EMPTY (nothing exceeds n/k) — the flush must still emit a
    sentinel row so the shard's exact n_items survives and day totals
    reconstruct (review finding: the old `if counters:` guard silently
    dropped the whole shard)."""
    in_path, out_path, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    rows = [
        {"item": f"u{i}", "ts": f"2024-03-05 03:00:{i:02d}"} for i in range(12)
    ]
    _drop(in_path, "b0.json", rows)
    _drop(in_path, "b1.json", [{"item": "wm", "ts": "2024-03-12 00:00:00"}])
    _run(spark, in_path, out_path, ckpt)

    out = spark.read.parquet(out_path).filter(
        "obs_day = DATE'2024-03-05'"
    ).collect()
    assert out, "the day must flush even if every summary compressed away"
    per_shard = {r["shard"]: r["n_items"] for r in out}
    assert sum(per_shard.values()) == 12
    # no surviving counter may overstate a singleton
    for r in out:
        if r["item"] is not None:
            assert r["count_lb"] <= 1
