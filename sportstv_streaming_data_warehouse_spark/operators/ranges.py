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


def _bucketed(df: DataFrame, start_col: str, end_col: str, bucket_size) -> DataFrame:
    """Explode an interval table to one row per covered bucket id."""
    return df.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_size)).cast("long"),
                F.floor(F.col(end_col) / F.lit(bucket_size)).cast("long"),
            )
        ),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_size,
) -> DataFrame:
    """Inner join of two INTERVAL tables on overlap:
    ``l.start <= r.end AND r.start <= l.end`` — exactly once per
    overlapping pair, as a bucket EQUI-join (no nested-loop / cartesian
    plan at any scale).

    Both sides explode to the buckets they span and equi-join on the
    bucket id; the exact overlap predicate refines. A pair that overlaps
    can share MANY buckets, so the canonical-bucket rule keeps each pair
    exactly once WITHOUT a distinct: emit only in the bucket containing
    ``max(l.start, r.start)``. That bucket is always shared (overlap ⇒
    ``max(starts) <= min(ends)``, so it lies inside both intervals'
    bucket ranges), making the rule both sound and complete.

    Work is O(Σ spans / bucket_size) replication + a hash join — pick
    ``bucket_size`` on the order of the typical interval span, exactly
    as in :func:`range_join`.
    """
    lb = _bucketed(left, left_start, left_end, bucket_size)
    rb = _bucketed(right, right_start, right_end, bucket_size)
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    canonical = F.col("__bucket") == F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / F.lit(bucket_size)
    ).cast("long")
    return lb.join(rb, "__bucket").filter(overlap & canonical).drop("__bucket")
