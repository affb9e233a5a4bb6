"""The reference's operational SQLite extract leg, end-to-end against a
real SQLite file (round-7 verdict task #5).

The reference reads streaming_txns from SQLite in 50K LIMIT/OFFSET
batches through one connection (loadAnalyticsDB.PractII.VarmaA.R:
132-134, 321-326, column list transaction_id/user_id/asset_id/
streaming_date/minutes_streamed/completed). sources/sqlite.read_sqlite
replays that extract with S1's real JDBC-leg semantics: projection and
predicate pushed into the SQL at the adapter, range-sharded parallel
reads per Spark's JDBC partitioning convention.
"""

import sqlite3

import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.sources.sqlite import (
    build_slice_sql,
    partition_clauses,
    read_sqlite,
)

N_TXNS = 4_000
TXN_COLS = [
    "transaction_id", "user_id", "asset_id",
    "streaming_date", "minutes_streamed", "completed",
]


@pytest.fixture(scope="module")
def db_path(tmp_path_factory):
    """An operational-store replica: streaming_txns shaped like the
    reference's (etl.R:321-326), deterministic rows, plus a NULL in the
    partition column to pin the slice-0 NULL ownership rule."""
    path = str(tmp_path_factory.mktemp("sqlite") / "operational.db")
    con = sqlite3.connect(path)
    con.execute(
        """CREATE TABLE streaming_txns (
             transaction_id INTEGER, user_id INTEGER, asset_id TEXT,
             streaming_date TEXT, minutes_streamed INTEGER,
             completed INTEGER, internal_audit_note TEXT)"""
    )
    rows = [
        (
            i,
            i % 300,
            f"IH-{i % 97}" if i % 7 else f"ZZ-{i % 11}",
            f"202{i % 4}-0{i % 9 + 1}-1{i % 9}",
            i % 180,
            i % 3 == 0,
            "never-extracted",
        )
        for i in range(1, N_TXNS)
    ]
    rows.append((N_TXNS, None, "IH-1", "2023-01-11", 30, 0, "null user"))
    con.executemany(
        "INSERT INTO streaming_txns VALUES (?,?,?,?,?,?,?)", rows
    )
    con.commit()
    con.close()
    return path


def test_partition_clauses_follow_spark_jdbc_convention():
    clauses = partition_clauses("transaction_id", 0, 100, 4)
    assert clauses == [
        '"transaction_id" < 25 OR "transaction_id" IS NULL',
        '"transaction_id" >= 25 AND "transaction_id" < 50',
        '"transaction_id" >= 50 AND "transaction_id" < 75',
        '"transaction_id" >= 75',
    ]
    # bounds shape the split, they never filter: the outer slices are
    # unbounded so stale bounds still cover the whole table
    assert "<" not in clauses[-1].replace(">=", "")
    assert partition_clauses("k", 0, 10, 1) == ["1=1"]


def test_partition_clauses_are_a_partition_of_the_key_space():
    # property: whatever the bounds/slice count, every key value —
    # inside the bounds, far outside them, or NULL — satisfies EXACTLY
    # one clause (no dup, no drop), evaluated by SQLite itself
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        lo=st.integers(-1000, 1000),
        span=st.integers(1, 2000),
        n=st.integers(1, 12),
        probes=st.lists(
            st.one_of(st.integers(-5000, 5000), st.none()),
            min_size=1, max_size=20,
        ),
    )
    def check(lo, span, n, probes):
        clauses = partition_clauses("k", lo, lo + span, n)
        with sqlite3.connect(":memory:") as con:
            con.execute("CREATE TABLE t (k INTEGER)")
            con.executemany(
                "INSERT INTO t VALUES (?)", [(p,) for p in probes]
            )
            total = sum(
                con.execute(
                    f"SELECT COUNT(*) FROM t WHERE {c}"
                ).fetchone()[0]
                for c in clauses
            )
        # COUNT(*) under each clause sums to the table size exactly
        assert total == len(probes), (clauses, probes)

    check()


def test_projection_and_predicate_are_pushed_into_the_sql():
    sql = build_slice_sql(
        "streaming_txns", ["user_id", "minutes_streamed"],
        "minutes_streamed > 60", '"transaction_id" < 25',
    )
    assert sql == (
        'SELECT "user_id", "minutes_streamed" FROM "streaming_txns" '
        'WHERE ("transaction_id" < 25) AND (minutes_streamed > 60)'
    )
    # the never-requested column must not appear anywhere in the SQL
    assert "internal_audit_note" not in sql


def test_sharded_extract_equals_single_connection_read(spark, db_path):
    df = read_sqlite(
        spark, db_path, "streaming_txns",
        columns=TXN_COLS,
        partition_column="transaction_id",
        lower_bound=1, upper_bound=N_TXNS, num_partitions=8,
    )
    assert df.columns == TXN_COLS
    assert df.rdd.getNumPartitions() == 8
    got = sorted(map(tuple, df.collect()))
    with sqlite3.connect(db_path) as con:
        expected = sorted(
            con.execute(
                f"SELECT {', '.join(TXN_COLS)} FROM streaming_txns"
            ).fetchall()
        )
    assert len(got) == N_TXNS
    assert got == expected


def test_null_and_boundary_rows_land_exactly_once(spark, db_path):
    # the union of slices is a partition of the table: no dup, no drop,
    # NULL partition keys owned by slice 0
    df = read_sqlite(
        spark, db_path, "streaming_txns",
        columns=["transaction_id", "user_id"],
        partition_column="user_id",  # has a NULL
        lower_bound=0, upper_bound=300, num_partitions=5,
    )
    ids = [r["transaction_id"] for r in df.collect()]
    assert len(ids) == len(set(ids)) == N_TXNS
    assert df.filter(F.col("user_id").isNull()).count() == 1


def test_predicate_pushdown_filters_at_the_source(spark, db_path):
    df = read_sqlite(
        spark, db_path, "streaming_txns",
        columns=["transaction_id", "minutes_streamed"],
        predicate="minutes_streamed >= 100",
        partition_column="transaction_id",
        lower_bound=1, upper_bound=N_TXNS, num_partitions=4,
    )
    rows = df.collect()
    assert rows and all(r["minutes_streamed"] >= 100 for r in rows)
    with sqlite3.connect(db_path) as con:
        n = con.execute(
            "SELECT COUNT(*) FROM streaming_txns WHERE minutes_streamed >= 100"
        ).fetchone()[0]
    assert len(rows) == n


def test_empty_probe_raises_a_schema_pointer(spark, db_path):
    # schema inference needs rows; an empty probe must point the caller
    # at the schema= parameter, not crash inside createDataFrame
    with pytest.raises(ValueError, match="schema="):
        read_sqlite(
            spark, db_path, "streaming_txns",
            columns=["transaction_id"],
            predicate="minutes_streamed > 1000000",
        )


def test_unsharded_read_is_one_task_with_probe_schema(spark, db_path):
    df = read_sqlite(
        spark, db_path, "streaming_txns", columns=["asset_id"]
    )
    assert df.rdd.getNumPartitions() == 1
    assert [f.name for f in df.schema.fields] == ["asset_id"]
    assert df.count() == N_TXNS


def test_probe_clean_column_with_nulls_in_a_later_slice(spark, db_path):
    # user_id is non-NULL for the first 100 rows (the driver probe
    # window) so it infers LongType — but the very last row has a NULL
    # user_id, and pandas hands that slice back as float64/NaN. Without
    # per-slice coercion to the nullable Int64 extension dtype the Arrow
    # boundary rejects (or lossily coerces) the drifted slice; with it,
    # the NULL lands as a proper SQL NULL and every other value is exact.
    df = read_sqlite(
        spark, db_path, "streaming_txns",
        columns=["transaction_id", "user_id"],
        partition_column="transaction_id",
        lower_bound=1, upper_bound=N_TXNS, num_partitions=4,
    )
    assert df.schema["user_id"].dataType.simpleString() == "bigint"
    nulls = df.filter(F.col("user_id").isNull()).collect()
    assert [r["transaction_id"] for r in nulls] == [N_TXNS]
    assert df.filter(F.col("user_id") == 299).count() > 0  # values intact
    assert df.count() == N_TXNS
