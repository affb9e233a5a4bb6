"""Streaming funnel twin: emitted (user, stage, ts) rows must equal the
batch w_event_funnel per-user stage frames on the same data, under
out-of-order multi-drop arrival — including the retroactive case where
a LATE-ARRIVING earlier view qualifies a click that a naive
arrival-order greedy machine would have discarded."""

import json
import os

from sportstv_streaming_data_warehouse_spark.streaming.funnel import (
    funnel_stream,
)


def _drop(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, in_path, out_path, ckpt, state_ttl="30 days"):
    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp"
    ).json(in_path)
    q = (
        funnel_stream(stream, delay="2 days", state_ttl=state_ttl)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _batch_funnel(rows):
    """Python replica of the batch w_event_funnel per-user stages."""
    out = {}
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_type"])
        )
    for u, evs in by_user.items():
        views = sorted(t for t, s in evs if s == "view")
        if not views:
            continue
        tv = views[0]
        out[(u, "view")] = tv
        clicks = sorted(t for t, s in evs if s == "click" and t > tv)
        if not clicks:
            continue
        tc = clicks[0]
        out[(u, "click")] = tc
        purch = sorted(t for t, s in evs if s == "purchase" and t > tc)
        if purch:
            out[(u, "purchase")] = purch[0]
    return out


def _rows():
    return [
        # user 1: clean view -> click -> purchase
        {"user_id": 1, "event_type": "view", "ts": "2024-06-01 10:00:00"},
        {"user_id": 1, "event_type": "click", "ts": "2024-06-01 11:00:00"},
        {"user_id": 1, "event_type": "purchase", "ts": "2024-06-01 12:00:00"},
        # user 2: purchase BEFORE click — must not count
        {"user_id": 2, "event_type": "view", "ts": "2024-06-01 10:00:00"},
        {"user_id": 2, "event_type": "purchase", "ts": "2024-06-01 10:30:00"},
        {"user_id": 2, "event_type": "click", "ts": "2024-06-01 11:00:00"},
        # user 3: click at the SAME instant as the view — strict >, no
        # conversion; a later click converts
        {"user_id": 3, "event_type": "view", "ts": "2024-06-01 09:00:00"},
        {"user_id": 3, "event_type": "click", "ts": "2024-06-01 09:00:00"},
        {"user_id": 3, "event_type": "click", "ts": "2024-06-01 09:05:00"},
        # user 4: the retroactive crux — click@05:00 precedes the first
        # view delivered in drop 1 (view@07:00); drop 2 delivers an
        # EARLIER view@03:00, so the final funnel is view@03:00,
        # click@05:00
        {"user_id": 4, "event_type": "click", "ts": "2024-06-01 05:00:00"},
        {"user_id": 4, "event_type": "view", "ts": "2024-06-01 07:00:00"},
        {"user_id": 4, "event_type": "view", "ts": "2024-06-01 03:00:00"},
        # user 5: no view at all — nothing emits
        {"user_id": 5, "event_type": "click", "ts": "2024-06-01 10:00:00"},
    ]


def test_stream_funnel_matches_batch_semantics(spark, tmp_path):
    in_path, out_path, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    rows = _rows()
    # drop 1: everything EXCEPT user 4's early view, in reverse order;
    # drop 2: the late early view (within the 2-day watermark), then a
    # watermark-advancing sentinel
    late_view = rows[11]
    assert late_view == {
        "user_id": 4, "event_type": "view", "ts": "2024-06-01 03:00:00"
    }
    drop1 = [r for i, r in enumerate(rows) if i != 11][::-1]
    _drop(in_path, "b0.json", drop1)
    _run(spark, in_path, out_path, ckpt)
    _drop(in_path, "b1.json", [late_view])
    _run(spark, in_path, out_path, ckpt)
    _drop(
        in_path,
        "b2.json",
        [{"user_id": 99, "event_type": "view", "ts": "2024-06-10 00:00:00"}],
    )
    _run(spark, in_path, out_path, ckpt)

    got = {
        (r["user_id"], r["stage"]): r["stage_ts"].strftime(
            "%Y-%m-%d %H:%M:%S"
        )
        for r in spark.read.parquet(out_path).collect()
        if r["user_id"] != 99
    }
    want = _batch_funnel(rows)
    assert got == want
    # the crux assertions, explicitly
    assert got[(4, "view")] == "2024-06-01 03:00:00"
    assert got[(4, "click")] == "2024-06-01 05:00:00"
    assert (2, "purchase") not in got
    assert got[(3, "click")] == "2024-06-01 09:05:00"
    assert (5, "view") not in got


def test_stream_funnel_parity_with_catalog_batch(spark, tmp_path):
    """Same emitted stages as the batch catalog query's per-user frames
    on fixture events (sf0.001), delivered in one drop."""
    from pyspark.sql import functions as F

    from sportstv_streaming_data_warehouse_spark.sources.fixtures import (
        load_table,
    )

    from .conftest import SF001

    ev = load_table(spark, SF001, "events").select(
        "user_id", "event_type", "ts"
    )
    rows = [
        {
            "user_id": r["user_id"],
            "event_type": r["event_type"],
            "ts": r["ts"].strftime("%Y-%m-%d %H:%M:%S.%f"),
        }
        for r in ev.collect()
    ]
    want = _batch_funnel(rows)

    in_path, out_path, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    _drop(in_path, "b0.json", rows)
    _drop(
        in_path,
        "b1.json",
        [{"user_id": 10**9, "event_type": "view",
          "ts": "2030-01-01 00:00:00"}],
    )
    _run(spark, in_path, out_path, ckpt)
    got = {
        (r["user_id"], r["stage"]): r["stage_ts"].strftime(
            "%Y-%m-%d %H:%M:%S.%f"
        )
        for r in spark.read.parquet(out_path).collect()
        if r["user_id"] != 10**9
    }
    assert got == want


def _ttl_scenario(spark, tmp_path, sub, state_ttl):
    """Shared drops for the TTL tests: user 9's view finalizes, the user
    then goes dormant while the watermark advances, and a fresh view
    arrives after the dormancy gap. Returns user 9's emitted view rows."""
    in_path, out_path, ckpt = (
        str(tmp_path / sub / "in"),
        str(tmp_path / sub / "out"),
        str(tmp_path / sub / "ckpt"),
    )
    _drop(in_path, "b0.json", [
        {"user_id": 9, "event_type": "view", "ts": "2024-06-01 00:00:00"},
        {"user_id": 99, "event_type": "view", "ts": "2024-06-05 00:00:00"},
    ])
    _run(spark, in_path, out_path, ckpt, state_ttl=state_ttl)
    # dormancy: only a sentinel advances the watermark far past
    # (last-activity watermark + ttl), so user 9's slot times out in a
    # batch where they have no data
    _drop(in_path, "b1.json", [
        {"user_id": 98, "event_type": "view", "ts": "2024-06-20 00:00:00"},
    ])
    _run(spark, in_path, out_path, ckpt, state_ttl=state_ttl)
    # the user returns; another sentinel finalizes their new view
    _drop(in_path, "b2.json", [
        {"user_id": 9, "event_type": "view", "ts": "2024-06-21 00:00:00"},
    ])
    _run(spark, in_path, out_path, ckpt, state_ttl=state_ttl)
    _drop(in_path, "b3.json", [
        {"user_id": 97, "event_type": "view", "ts": "2024-06-25 00:00:00"},
    ])
    _run(spark, in_path, out_path, ckpt, state_ttl=state_ttl)
    return sorted(
        r["stage_ts"].strftime("%Y-%m-%d")
        for r in spark.read.parquet(out_path).collect()
        if r["user_id"] == 9 and r["stage"] == "view"
    )


def test_state_ttl_evicts_dormant_user_and_funnel_restarts(
    spark, tmp_path
):
    """Round-6 advisor finding: per-user state must not live for the
    stream lifetime. With a 3-day TTL the dormant user's slot is
    evicted, so the returning view starts a FRESH funnel and re-emits —
    the documented per-dormancy-epoch trade-off that proves the state
    was actually dropped."""
    views = _ttl_scenario(spark, tmp_path, "short", state_ttl="3 days")
    assert views == ["2024-06-01", "2024-06-21"]


def test_long_ttl_keeps_state_and_suppresses_reemission(spark, tmp_path):
    """Control: with a TTL longer than the dormancy gap the slot
    survives, the machine remembers view is already completed, and the
    returning view emits nothing."""
    views = _ttl_scenario(spark, tmp_path, "long", state_ttl="300 days")
    assert views == ["2024-06-01"]
