"""plans.merge contract tests: MERGE semantics per mode, idempotent
replay, and — the round-2 verdict ask — a crash-window sweep that kills
the rename-aside swap between every adjacent step and asserts
recover_dataset restores a readable, correct dataset from each
intermediate state."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans.merge import (
    RETIRED_SUFFIX,
    STAGING_SUFFIX,
    merge_into,
    recover_dataset,
    replace_partitions,
)


def _target(spark, path):
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, name string, v int"
    ).write.mode("overwrite").parquet(path)


def _source(spark):
    return spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)], "k int, name string, v int"
    )


def _rows(spark, path):
    return {
        tuple(r) for r in spark.read.parquet(path).select("k", "name", "v").collect()
    }


def test_upsert_update_all_insert_all(spark, tmp_path):
    path = str(tmp_path / "t")
    _target(spark, path)
    merge_into(spark, path, _source(spark), on=["k"])
    assert _rows(spark, path) == {
        (1, "a", 10),
        (2, "B", 200),  # replaced
        (3, "c", 30),
        (4, "d", 40),  # inserted
    }


def test_merge_is_idempotent_on_replay(spark, tmp_path):
    path = str(tmp_path / "t")
    _target(spark, path)
    merge_into(spark, path, _source(spark), on=["k"])
    once = _rows(spark, path)
    merge_into(spark, path, _source(spark), on=["k"])
    assert _rows(spark, path) == once


def test_null_keyed_rows_merge_idempotently(spark, tmp_path):
    # key comparison is null-safe (like Delta's `t.k <=> s.k`): a
    # NULL-keyed row is UPDATED on replay, never re-inserted — plain
    # equality would append one copy per replay (round-8 review finding)
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(None, "n", 1), (1, "a", 10)], "k int, name string, v int"
    ).write.parquet(path)
    batch = spark.createDataFrame(
        [(None, "N", 2), (2, "b", 20)], "k int, name string, v int"
    )
    merge_into(spark, path, batch, on=["k"])
    merge_into(spark, path, batch, on=["k"])  # replay
    assert _rows(spark, path) == {(None, "N", 2), (1, "a", 10), (2, "b", 20)}


def test_when_matched_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    _target(spark, path)
    merge_into(
        spark, path, _source(spark), on=["k"],
        when_matched="delete", when_not_matched=None,
    )
    assert _rows(spark, path) == {(1, "a", 10), (3, "c", 30)}


def test_when_matched_expressions_additive(spark, tmp_path):
    """The reference's additive upsert (ON DUPLICATE KEY UPDATE
    x = x + VALUES(x), etl.R:396-413) through the seam."""
    path = str(tmp_path / "t")
    _target(spark, path)
    merge_into(
        spark, path, _source(spark), on=["k"],
        when_matched={"v": F.col("t.v") + F.col("s.v")},
    )
    assert _rows(spark, path) == {
        (1, "a", 10),
        (2, "b", 220),  # 20 + 200, name kept from target
        (3, "c", 30),
        (4, "d", 40),
    }


def test_insert_only_ignores_matches(spark, tmp_path):
    """INSERT IGNORE semantics (etl.R:300-312): matched rows untouched."""
    path = str(tmp_path / "t")
    _target(spark, path)
    merge_into(
        spark, path, _source(spark), on=["k"],
        when_matched=None, when_not_matched="insert_all",
    )
    assert _rows(spark, path) == {
        (1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)
    }


def test_missing_target_is_create_table_as_merge(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_into(spark, path, _source(spark), on=["k"])
    assert _rows(spark, path) == {(2, "B", 200), (4, "d", 40)}


def test_replace_partitions_touches_only_batch_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    full = spark.createDataFrame(
        [(2023, 1, 100), (2023, 2, 200), (2024, 1, 300)], "year int, m int, v int"
    )
    full.write.mode("overwrite").partitionBy("year").parquet(path)
    batch = spark.createDataFrame([(2024, 9, 999)], "year int, m int, v int")
    replace_partitions(batch, path, ["year"])
    got = {
        tuple(r)
        for r in spark.read.parquet(path).select("year", "m", "v").collect()
    }
    # 2023 rows intact, 2024 partition replaced wholesale
    assert got == {(2023, 1, 100), (2023, 2, 200), (2024, 9, 999)}
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static"
    )


# ---------------------------------------------------------------------------
# Crash-window sweep. Swap sequence with a complete staging copy:
#   step 0: (base=old, staging=new)            — crash before any rename
#   step 1: (no base, staging=new, retired=old) — crash between renames
#   step 2: (base=new, retired=old)             — crash before cleanup
#   step 3: (base=new)                          — completed
# recover_dataset must yield a readable dataset from every state: the NEW
# data wherever the committed staging/new copy survives (roll forward),
# the OLD data only when the merge result never existed (roll back).
# ---------------------------------------------------------------------------

OLD = {(1, "old")}
NEW = {(1, "new"), (2, "new")}


def _mk(spark, path, rows):
    spark.createDataFrame(sorted(rows), "k int, tag string").write.mode(
        "overwrite"
    ).parquet(path)


def _crash_state(spark, base, step):
    staging, retired = base + STAGING_SUFFIX, base + RETIRED_SUFFIX
    if step == 0:
        _mk(spark, base, OLD)
        _mk(spark, staging, NEW)
    elif step == 1:
        _mk(spark, retired, OLD)
        _mk(spark, staging, NEW)
    elif step == 2:
        _mk(spark, retired, OLD)
        _mk(spark, base, NEW)
    elif step == 3:
        _mk(spark, base, NEW)


@pytest.mark.parametrize("step", [0, 1, 2, 3])
def test_recovery_from_every_crash_point(spark, tmp_path, step):
    base = str(tmp_path / "t")
    _crash_state(spark, base, step)
    recover_dataset(base)
    got = {tuple(r) for r in spark.read.parquet(base).collect()}
    # step 0: the swap never started — old state, replay re-merges.
    # steps 1-3: the committed merge result exists — roll forward.
    assert got == (OLD if step == 0 else NEW)
    assert not os.path.isdir(base + STAGING_SUFFIX)
    assert not os.path.isdir(base + RETIRED_SUFFIX)


def test_recovery_rolls_back_on_incomplete_staging(spark, tmp_path):
    """Lost/partial staging (no _SUCCESS) with base renamed aside: the
    only complete copy is the retired one — roll back to it."""
    base = str(tmp_path / "t")
    staging, retired = base + STAGING_SUFFIX, base + RETIRED_SUFFIX
    _mk(spark, retired, OLD)
    _mk(spark, staging, NEW)
    os.remove(os.path.join(staging, "_SUCCESS"))
    recover_dataset(base)
    got = {tuple(r) for r in spark.read.parquet(base).collect()}
    assert got == OLD
    assert not os.path.isdir(staging) and not os.path.isdir(retired)


def test_merge_resumes_after_crash_between_renames(spark, tmp_path):
    """End-to-end: a merge whose predecessor crashed mid-swap lands on
    the recovered state and produces the same result as an uncrashed
    sequence."""
    base = str(tmp_path / "t")
    _crash_state(spark, base, 1)  # worst window: base missing
    merge_into(
        spark,
        base,
        spark.createDataFrame([(2, "patched")], "k int, tag string"),
        on=["k"],
    )
    got = {tuple(r) for r in spark.read.parquet(base).collect()}
    assert got == {(1, "new"), (2, "patched")}


def test_compact_recovers_missing_base(spark, tmp_path):
    """layout.compact's preamble restores a dataset whose prior compact
    crashed between the renames (round-2 ADVICE finding)."""
    from sportstv_streaming_data_warehouse_spark.plans.layout import compact

    base = str(tmp_path / "t")
    staging, retired = base + "__compacting", base + RETIRED_SUFFIX
    _mk(spark, retired, OLD)
    _mk(spark, staging, NEW)
    compact(spark, base)
    got = {tuple(r) for r in spark.read.parquet(base).collect()}
    assert got == NEW
    assert not os.path.isdir(staging) and not os.path.isdir(retired)
