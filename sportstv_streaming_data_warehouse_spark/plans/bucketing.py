"""Bucketed (co-located) joins — the shuffle-elimination strategy for
repeated big⋈big joins at 100 TB (SURVEY.md 'Partitioning & shuffle').

The reference never needs this (its biggest join side is 1.18M rows and
MySQL handles it with indexes), but at cluster scale the fact⋈dim join on
a NON-broadcastable dim (e.g. a billion-user dimension) shuffles both
sides on every query. Bucketing pre-partitions both tables by the join
key at write time, so every subsequent join is a zero-exchange zip of
co-located buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist a table bucketed (and bucket-sorted) by the join key.

    Sorted buckets additionally let Spark pick a merge join with NO sort
    step — scan, zip, join.
    """
    # one file per bucket: Spark only trusts bucket-sortedness (and can
    # skip the per-query Sort) when each bucket is a single file
    df = df.repartition(num_buckets, bucket_col)
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket counts Catalyst plans SortMergeJoin with ZERO Exchange —
    verified by tests/test_bucketing.py."""
    return spark.table(left_table).join(spark.table(right_table), on)
