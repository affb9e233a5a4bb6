"""Incremental fact maintenance: recomputing only touched year
partitions must equal a full rebuild, leave untouched partitions'
files alone, and keep unique_user_count exact (unlike the reference's
additive approximation)."""

import os

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans import star

from .fixtures_ref import generate


def _sorted_rows(df):
    return sorted(map(str, df.select(*sorted(df.columns)).collect()))


def test_incremental_equals_full_rebuild(spark, tmp_path):
    data = {k: spark.createDataFrame(v) for k, v in generate(3000, 10).items()}
    uc = star.build_user_country(
        data["subscribers"], data["postal2city"], data["cities"]
    )
    asset_sport = data["assets"].filter(
        F.col("sport").isNotNull() & (F.col("sport") != "")
    ).select("asset_id", "sport")

    txns = data["streaming_txns"]
    base = txns.filter(F.col("transaction_id") <= 2000)
    late = txns.filter(F.col("transaction_id") > 2000).filter(
        F.year(F.to_date("streaming_date")) == 2021  # touches 2021 only
    )

    path = str(tmp_path / "fact")
    enriched_base = star.enrich_transactions(base, uc, asset_sport)
    star.write_fact(star.build_fact(enriched_base), path)
    files_2020_before = set(os.listdir(f"{path}/year=2020"))

    merged = base.unionByName(late)
    enriched_all = star.enrich_transactions(merged, uc, asset_sport)
    enriched_late = star.enrich_transactions(late, uc, asset_sport)
    star.incremental_update(spark, path, enriched_all, enriched_late)

    got = spark.read.parquet(path)
    full = star.build_fact(enriched_all)
    assert _sorted_rows(got) == _sorted_rows(full)
    # exact distinct preserved (not the additive double-count)
    row = got.orderBy(F.desc("transaction_count")).first()
    assert row["unique_user_count"] <= row["transaction_count"]
    # untouched partition files were not rewritten
    assert set(os.listdir(f"{path}/year=2020")) == files_2020_before


def test_incremental_update_runs_no_driver_side_action(
    spark, tmp_path, monkeypatch
):
    """Round-14 (round-13 verdict task 7): the touched-years set is a
    broadcast semi-join subquery inside the single refresh write, not a
    separate eager .distinct().collect() that executed the new batch's
    whole enrichment tree before the refresh re-ran it. Pin the shape:
    no driver-side action (collect/first/count/toPandas) may fire
    inside incremental_update — its one eager boundary is the
    partition-grain write."""
    from pyspark.sql import DataFrame

    data = {k: spark.createDataFrame(v) for k, v in generate(2000, 10).items()}
    uc = star.build_user_country(
        data["subscribers"], data["postal2city"], data["cities"]
    )
    asset_sport = data["assets"].filter(
        F.col("sport").isNotNull() & (F.col("sport") != "")
    ).select("asset_id", "sport")
    txns = data["streaming_txns"]
    base = txns.filter(F.col("transaction_id") <= 1500)
    late = txns.filter(F.col("transaction_id") > 1500)
    path = str(tmp_path / "fact")
    star.write_fact(star.build_fact(star.enrich_transactions(base, uc, asset_sport)), path)

    enriched_all = star.enrich_transactions(
        base.unionByName(late), uc, asset_sport
    )
    enriched_late = star.enrich_transactions(late, uc, asset_sport)

    actions = []
    for name in ("collect", "first", "count", "toPandas", "head", "take"):
        orig = getattr(DataFrame, name)

        def spy(self, *a, _name=name, _orig=orig, **kw):
            actions.append(_name)
            return _orig(self, *a, **kw)

        monkeypatch.setattr(DataFrame, name, spy)
    star.incremental_update(spark, path, enriched_all, enriched_late)
    assert actions == [], f"driver-side actions inside incremental_update: {actions}"
    # and the refresh is still correct
    got = spark.read.parquet(path)
    full = star.build_fact(enriched_all)
    assert _sorted_rows(got) == _sorted_rows(full)
