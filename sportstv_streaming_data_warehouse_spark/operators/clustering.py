"""Deterministic k-means (Lloyd) rounds over an embedding column.

The iterative-ML pattern on Spark: each round is (1) a broadcast of k
centroids against the vector corpus with an argmin assignment, (2) a
hash-aggregated centroid update. Unlike textbook float k-means, every
step here is ENGINE-PORTABLE so a full round can be replayed in plain
SQL and hash-compared (the same contract as the IVF pipeline in
operators/similarity.py, extended to the centroid UPDATE):

- distances: squared L2 as a left-to-right fold over dimensions of
  (cast(v_j as double) - cast(c_j as double))^2 — a fixed IEEE tree,
  identical in any engine that folds in index order;
- argmin: ROW_NUMBER over (distance, centroid_id) — the id tiebreak
  makes equal distances deterministic;
- centroid means: per-dimension sums accumulate in DECIMAL(20,8) after
  an exact float->double widening (double->decimal rounding agrees
  across engines where float->decimal does NOT — measured), then one
  double division by the exact count. Decimal addition is associative,
  so the shuffle's reduction order can't change the mean.

Scale posture: k centroids broadcast (kilobytes); assignment is a
narrow map over the corpus; the update is one hash-agg keyed on
(cluster, dim) with map-side partials. No iteration-scoped state lives
on the driver beyond the k x d centroid table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEAN_DECIMAL = "decimal(20,8)"


def _sq_l2_expr(a, b):
    """Squared L2 as the zip_with/aggregate expression: a left-to-right
    fold of (aᵢ-bᵢ)² in index order — the fixed IEEE tree the module
    docstring promises, identical in any engine that folds in index
    order (the SQL oracle replays it)."""
    diff = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v)


def _sq_l2_pandas(a, b):
    """Squared L2 as an Arrow-batched pandas_udf, BIT-IDENTICAL to
    ``_sq_l2_expr``: one correctly-rounded (aᵢ-bᵢ)² added per dimension
    in ascending order — the same fixed IEEE tree, pinned by
    tests/test_arrow_twin_edges.py.

    This is the k-means hot path BY SCALE MEASUREMENT (round-9 dual-
    scale A/B): at sf0.1 the interpreted fold is 1.2x faster (Python
    worker fixed cost dominates 256K pairs), but at 100x the twin is
    1.8x faster (24.2 s vs 43.5 s over ~26M pairs) — the interpreted
    zip_with lambda evaluates the subtraction TWICE per element
    ((x-y)*(x-y) appears twice in the expression tree), so sq_l2 pays
    ~2x a dot's interpreter cost, which is why this site inverts with
    scale while the dot sites don't. The 100 TB posture wins the tie.
    Batching scaffolding and the null/ragged/NaN/width-mismatch policy
    live in similarity.arrow_pair_fold (one audited spot)."""
    from .similarity import arrow_pair_fold

    def _kernel(_np, A, B):
        acc = _np.zeros(len(A))
        for d in range(A.shape[1]):
            diff = A[:, d] - B[:, d]
            acc = acc + diff * diff
        return acc

    return arrow_pair_fold(_kernel)(a, b)


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster_id): nearest centroid by squared L2, ties to the
    smallest centroid id. ``centroids`` is (cid, c) with c an array
    column; it is broadcast (k rows).

    The argmin is MIN over a (dist, cid) struct — lexicographic struct
    comparison gives the id tiebreak, and a hash-agg with map-side
    partial MINs beats a row_number window (which would sort k rows per
    key after a shuffle) while matching the oracle's
    ROW_NUMBER OVER (ORDER BY dist, cid) = 1 exactly."""
    dist = _sq_l2_pandas(F.col(vec_col), F.col("__c"))
    joined = vectors.select(id_col, vec_col).crossJoin(
        F.broadcast(centroids.select("cid", F.col("c").alias("__c")))
    )
    return (
        joined.withColumn("__dist", dist)
        .groupBy(id_col)
        .agg(F.min(F.struct(F.col("__dist"), F.col("cid"))).alias("__best"))
        .select(id_col, F.col("__best.cid").alias("cluster_id"))
    )


def update_centroids(
    vectors: DataFrame,
    assignments: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, c): per-cluster per-dimension mean via exact decimal sums.
    Empty clusters simply vanish (no row), as in textbook Lloyd."""
    means = (
        vectors.join(assignments, id_col)
        .select("cluster_id", F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("cluster_id", "dim")
        .agg(
            (
                F.sum(F.col("v").cast("double").cast(MEAN_DECIMAL)).cast("double")
                / F.count("*")
            ).alias("m")
        )
    )
    return means.groupBy(F.col("cluster_id").alias("cid")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))),
            lambda s: s["m"],
        ).alias("c")
    )


def lloyd_round(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """One Lloyd round: (assignments under the INPUT centroids, updated
    centroids from those assignments)."""
    assign = assign_clusters(vectors, centroids, id_col, vec_col)
    return assign, update_centroids(vectors, assign, id_col, vec_col)
