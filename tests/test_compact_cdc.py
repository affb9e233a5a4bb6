"""Operational utilities: small-files compaction (data-identical, fewer
files) and CDC diffing between fact versions."""

import glob

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans.cdc import diff_facts
from sportstv_streaming_data_warehouse_spark.plans.layout import compact


def test_compaction_reduces_files_preserves_data(spark, tmp_path):
    path = str(tmp_path / "many")
    # simulate a streaming sink: 40 tiny files
    spark.range(0, 4000).withColumn("v", F.col("id") * 2).repartition(40).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 40
    before = spark.read.parquet(path).agg(F.sum("v"), F.count("*")).first()

    n_files = compact(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert n_files == 1
    after = spark.read.parquet(path).agg(F.sum("v"), F.count("*")).first()
    assert tuple(before) == tuple(after)

    # already-compact data is left untouched
    assert compact(spark, path, target_file_bytes=10 * 1024 * 1024) == 1


def test_diff_facts(spark):
    old = spark.createDataFrame(
        [(1, "A", 10, 5), (2, "A", 20, 8), (3, "B", 30, 9)],
        ["date_id", "sport", "txns", "users"],
    )
    new = spark.createDataFrame(
        [(1, "A", 10, 5),      # unchanged → dropped
         (2, "A", 25, 8),      # txns changed
         (4, "B", 7, 2)],      # inserted; (3,B) deleted
        ["date_id", "sport", "txns", "users"],
    )
    out = {
        (r["date_id"], r["sport"]): r["change_type"]
        for r in diff_facts(old, new, ["date_id", "sport"], ["txns", "users"]).collect()
    }
    assert out == {(2, "A"): "updated", (3, "B"): "deleted", (4, "B"): "inserted"}
