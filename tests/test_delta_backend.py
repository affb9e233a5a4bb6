"""Backend selection for the MERGE seam (round-7 verdict task #3):
parquet swap today, Delta auto-activated the moment delta-spark is
importable — green both ways, with the Delta leg skip-marked until the
package lands in the sandbox.
"""

import pytest

from sportstv_streaming_data_warehouse_spark.plans import merge


def test_backend_selection_matches_probe():
    # the probe IS the selector: no config knob to drift out of sync
    assert merge.merge_backend() == (
        "delta" if merge.delta_available() else "parquet_swap"
    )


def test_parquet_swap_is_the_fallback_without_delta(monkeypatch):
    monkeypatch.setattr(merge, "delta_available", lambda: False)
    assert merge.merge_backend() == "parquet_swap"


def test_delta_path_is_dispatched_when_probe_fires(monkeypatch, tmp_path):
    # with the probe forced on, merge_into must route to the Delta
    # compiler (captured via stub) and never touch the parquet swap
    monkeypatch.setattr(merge, "delta_available", lambda: True)
    calls = {}
    monkeypatch.setattr(
        merge,
        "_merge_into_delta",
        lambda *a, **k: calls.setdefault("args", a),
    )
    merge.merge_into(None, str(tmp_path / "t"), None, on=["k"])
    assert calls["args"][3] == ["k"]
    assert not (tmp_path / "t").exists(), "parquet swap ran despite delta"


def test_delta_path_validates_clauses_before_touching_the_target(tmp_path):
    # a typo'd clause must raise like the parquet backend — never
    # silently write an empty table on the missing-target path; the
    # validation runs before the delta import, so it is testable here
    with pytest.raises(ValueError, match="when_not_matched"):
        merge._merge_into_delta(
            None, str(tmp_path / "t"), None, ["k"], "update_all", "insertAll"
        )
    with pytest.raises(ValueError, match="when_matched"):
        merge._merge_into_delta(
            None, str(tmp_path / "t"), None, ["k"], "updateAll", "insert_all"
        )
    assert not (tmp_path / "t").exists()


@pytest.mark.skipif(
    not merge.delta_available(), reason="delta-spark not installed in sandbox"
)
def test_delta_merge_end_to_end(spark, tmp_path):
    # auto-activates when the sandbox gains delta-spark: same contract
    # tests/test_merge.py pins on the parquet backend
    target = str(tmp_path / "delta_fact")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    merge.merge_into(spark, target, base, on=["k"])
    batch = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    merge.merge_into(spark, target, batch, on=["k"])
    got = {(r["k"], r["v"]) for r in spark.read.format("delta").load(target).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_delta_path_refuses_a_parquet_swap_era_target(spark, tmp_path):
    # A dataset the parquet_swap backend built is NOT a Delta table; when
    # delta-spark later becomes importable the backend must refuse to
    # CREATE a fresh Delta table over it (which would drop every
    # pre-existing row from the merge) and demand an explicit one-time
    # conversion. The guard is stdlib-only (non-empty dir, no _delta_log)
    # so it is pinned here without the package.
    target = tmp_path / "fact"
    target.mkdir()
    (target / "part-00000.parquet").write_bytes(b"PAR1")
    with pytest.raises(ValueError, match="_delta_log"):
        merge._merge_into_delta(
            spark, str(target), None, ["k"], "update_all", "insert_all"
        )
    # the old files are untouched
    assert (target / "part-00000.parquet").read_bytes() == b"PAR1"


def test_guard_resolves_schemeless_paths_via_hadoop_fs(
    spark, tmp_path, monkeypatch
):
    # Round-9 ADVICE: with a session, schemeless paths must go through
    # the Hadoop FileSystem branch (makeQualified resolves them against
    # fs.defaultFS — where Spark/Delta will actually write), never the
    # driver-local stdlib branch, which on a cluster whose defaultFS is
    # HDFS would inspect a same-named LOCAL path and silently let the
    # data-loss hazard through. The stdlib helper is booby-trapped:
    # any touch of it while a session is supplied fails the test.
    def boom(_):
        raise AssertionError(
            "stdlib fallback consulted despite a live session"
        )

    monkeypatch.setattr(merge, "_non_delta_dataset_local", boom)
    target = tmp_path / "fact"
    target.mkdir()
    (target / "part-00000.parquet").write_bytes(b"PAR1")
    assert merge._non_delta_dataset_at(spark, str(target)) is True
    (target / "_delta_log").mkdir()
    assert merge._non_delta_dataset_at(spark, str(target)) is False
    assert merge._non_delta_dataset_at(spark, str(tmp_path / "nope")) is False
    # and the no-session path still uses (only) the stdlib fallback
    monkeypatch.undo()
    assert merge._non_delta_dataset_at(None, str(target)) is False
    (target / "_delta_log").rmdir()
    assert merge._non_delta_dataset_at(None, str(target)) is True


@pytest.mark.skipif(
    merge.delta_available(),
    reason="fall-through asserted via the delta ImportError, which "
    "cannot fire once the package is installed (the e2e test covers "
    "the installed path)",
)
def test_delta_path_missing_target_guard_ignores_marker_only_dirs(tmp_path):
    # a dir holding only underscore-marker files (e.g. a leftover
    # _SUCCESS) carries no data — it must fall through to the
    # missing-target branch, whose next statement is the delta import
    target = tmp_path / "empty_fact"
    target.mkdir()
    (target / "_SUCCESS").touch()
    with pytest.raises(ImportError):
        merge._merge_into_delta(
            None, str(target), None, ["k"], "update_all", "insert_all"
        )
