"""Registry-ordering invariants: the driver records correctness for a
fixed-size prefix of queries(), so that prefix must be exactly the
curated window — every entry oracle-backed — with rows-only checks last."""

from sportstv_streaming_data_warehouse_spark.plans.catalog import (
    CORRECTNESS_WINDOW,
    all_oracles,
    all_queries,
)


def test_window_is_the_registry_prefix():
    names = list(all_queries())
    assert names[: len(CORRECTNESS_WINDOW)] == CORRECTNESS_WINDOW


def test_window_entries_all_have_oracles():
    oracles = all_oracles()
    missing = [n for n in CORRECTNESS_WINDOW if n not in oracles]
    assert not missing, f"window entries without oracle: {missing}"


def test_rows_only_queries_come_last():
    names = list(all_queries())
    oracles = all_oracles()
    tail_start = min(
        (i for i, n in enumerate(names) if n not in oracles), default=len(names)
    )
    assert all(n not in oracles for n in names[tail_start:]), (
        "rows-only queries must form a contiguous tail"
    )


def test_window_size_matches_driver_budget():
    assert len(CORRECTNESS_WINDOW) == 50
