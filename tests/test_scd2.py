"""SCD Type-2: version history stays consistent under updates, and
point-in-time enrichment attributes each event to the version in force
at its timestamp (not today's)."""

import datetime as dt

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans import scd


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _history(spark):
    dim = spark.createDataFrame(
        [(1, "Deutschland"), (2, "Schweiz")], ["user_id", "country"]
    )
    h = scd.init_scd2(dim, "user_id", ["country"], "2021-01-01 00:00:00")
    # user 1 moves on 2021-06-01; user 2 unchanged (no-op update)
    updates = spark.createDataFrame(
        [(1, "Österreich"), (2, "Schweiz")], ["user_id", "country"]
    )
    return scd.apply_scd2(h, updates, "user_id", ["country"], "2021-06-01 00:00:00")


def test_history_versions(spark):
    h = _history(spark).orderBy("user_id", "effective_from").collect()
    assert len(h) == 3  # user1 x2 versions, user2 x1 (no-op ignored)
    u1 = [r for r in h if r["user_id"] == 1]
    assert [r["country"] for r in u1] == ["Deutschland", "Österreich"]
    assert u1[0]["effective_to"] == _ts("2021-06-01T00:00:00")
    assert not u1[0]["is_current"] and u1[1]["is_current"]
    u2 = [r for r in h if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"]


def test_point_in_time_enrichment(spark):
    h = _history(spark)
    events = spark.createDataFrame(
        [
            (100, 1, _ts("2021-03-15T12:00:00")),  # before the move
            (101, 1, _ts("2021-06-01T00:00:00")),  # at the boundary (new version)
            (102, 1, _ts("2021-09-01T12:00:00")),  # after the move
            (103, 2, _ts("2021-07-01T12:00:00")),
            (104, 1, _ts("2020-12-01T12:00:00")),  # before any version
        ],
        ["event_id", "user_id", "ts"],
    )
    out = {
        r["event_id"]: r["country"]
        for r in scd.enrich_point_in_time(
            events, h, "user_id", "ts", ["country"]
        ).collect()
    }
    assert out == {
        100: "Deutschland",
        101: "Österreich",
        102: "Österreich",
        103: "Schweiz",
        104: None,
    }


def test_second_update_round(spark):
    h = _history(spark)
    updates = spark.createDataFrame([(2, "Liechtenstein")], ["user_id", "country"])
    h2 = scd.apply_scd2(h, updates, "user_id", ["country"], "2021-12-01 00:00:00")
    rows = h2.filter(F.col("user_id") == 2).orderBy("effective_from").collect()
    assert [r["country"] for r in rows] == ["Schweiz", "Liechtenstein"]
    assert rows[0]["effective_to"] == _ts("2021-12-01T00:00:00")
    # exactly one current version per key, intervals contiguous
    cur = h2.filter(F.col("is_current")).groupBy("user_id").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_new_keys_enter_history_and_batch_dupes_collapse(spark):
    """Keys absent from the dimension become first versions at change_ts;
    exact-duplicate update rows collapse to one version."""
    dim = spark.createDataFrame([(1, "Deutschland")], ["user_id", "country"])
    h = scd.init_scd2(dim, "user_id", ["country"], "2021-01-01 00:00:00")
    updates = spark.createDataFrame(
        [(3, "Italia"), (3, "Italia"), (1, "Deutschland")],
        ["user_id", "country"],
    )
    out = scd.apply_scd2(
        h, updates, "user_id", ["country"], "2021-06-01 00:00:00"
    ).orderBy("user_id", "effective_from").collect()
    assert [(r["user_id"], r["country"], r["is_current"]) for r in out] == [
        (1, "Deutschland", True),   # no-op update: untouched
        (3, "Italia", True),        # brand-new key: one first version
    ]
    u3 = [r for r in out if r["user_id"] == 3][0]
    assert u3["effective_from"] == _ts("2021-06-01T00:00:00")
