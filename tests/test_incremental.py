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
