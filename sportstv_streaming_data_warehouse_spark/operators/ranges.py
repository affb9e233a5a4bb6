"""Range (interval) join — the second custom operator Spark lacks a fast
native path for. A naive ``points.join(intervals, lo <= p AND p <= hi)``
plans BroadcastNestedLoopJoin (or worse, a cartesian product): O(|points|
× |intervals|) comparisons.

The scale path: quantize the domain into buckets, explode each interval
to the buckets it covers, bucket each point, then EQUI-join on the
bucket id and refine with the exact predicate. Work becomes
O(|points| + Σ interval_spans / bucket_size) with a hash-partitioned
join — the standard banding trick (same family as the LSH/SimHash
candidate joins in dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_size: float,
) -> DataFrame:
    """Inner join: every (point, interval) pair with
    ``start <= point <= end``, via bucket equi-join + exact refine.

    ``bucket_size`` should be on the order of the typical interval span:
    too small explodes interval replication, too large inflates the
    refine set.
    """
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / F.lit(bucket_size)).cast("long")
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_size)).cast("long"),
                F.floor(F.col(end_col) / F.lit(bucket_size)).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, "__bucket")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__bucket")
    )
