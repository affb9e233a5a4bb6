"""Iterative graph propagation — multi-step PageRank over an edge list.

The catalog's ``x_pagerank_step`` verifies ONE superstep end-to-end
against a SQL oracle; this module chains supersteps with a driver loop
(the same bounded-iteration discipline as the k-means Lloyd rounds in
operators/clustering.py: each round is one equi-join + one hash-agg, the
driver holds only the loop counter, never data).

Determinism contract: all mass is EXACT integer fixed-point. Node v
starts with ``unit`` mass; each step

    pr'(v) = round(0.15 * unit) + sum_u floor(85 * pr(u) / (100 * deg(u)))

over in-neighbors u. Integer floors leak a little mass per step (at most
deg(u) - 1 parts in 100*deg(u) per node) — rankings are unaffected and
two engines can never disagree on a result bit.

Scale: per iteration ONE shuffle of (src, pr) onto the edge list's src
key and one hash-agg on dst — the Pregel superstep shape. State between
iterations is a (node, pr) frame persisted with an LRU-1 discipline;
iterations is a small constant (PageRank converges geometrically at
damping^t), so the lineage stays shallow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_UNIT = 1_000_000_000


def symmetric_edges(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Undirected pair list -> both-direction (src, dst) edge list."""
    return pairs.select(F.col(a).alias("src"), F.col(b).alias("dst")).unionAll(
        pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    unit: int = DEFAULT_UNIT,
    tol: int | None = None,
) -> DataFrame:
    """Up to ``n_iter`` exact-integer PageRank supersteps (damping 0.85)
    over an (src, dst) edge list. Returns (node, degree, pr) with ``pr``
    in ``unit`` fixed-point (uniform init: every node starts at
    ``unit``). With ``tol`` set, iteration stops early once the maximum
    per-node |Δpr| falls to ``tol`` units or below — the convergence
    check is a single 1-row max-agg per superstep (driver holds one
    scalar, never data; PageRank contracts geometrically at 0.85^t so
    the check fires in O(log(unit/tol)) steps).
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if tol is not None and tol < 0:
        raise ValueError("tol must be >= 0")
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    ed = edges.join(deg, "src").persist()
    ed.count()  # materialize once; reused every iteration

    # full node universe (src UNION dst): on a DIRECTED graph, seeding
    # from out-degree nodes alone would drop sinks from the state, and
    # rebuilding state from groupBy(dst) alone would silently drop
    # source-only nodes (losing their base mass and all their later
    # contributions) after one superstep — the round-5 advice finding.
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    nodes.count()

    base = F.lit(round(0.15 * unit))
    pr = nodes.select("node", F.lit(unit).cast("long").alias("pr"))
    pr_is_cached = False
    for _ in range(n_iter):
        contrib = (
            ed.join(pr, ed.src == pr.node)
            .select(
                F.col("dst"),
                # INTEGRAL division (div), not floor-of-double: float '/'
                # rounds the quotient once 85*pr exceeds 2^53, breaking
                # the exact-integer contract at hub-scale ranks
                # (round-5 review finding)
                F.expr("(85 * pr) div (100 * out_deg)")
                .cast("long")
                .alias("c"),
            )
        )
        nxt = (
            # left-join onto the node universe: nodes with no in-edges
            # keep their 0.15*unit base mass instead of vanishing.
            # (Mass arriving at out-degree-0 sinks is absorbed — the
            # standard dangling-mass simplification; rankings among
            # non-sink nodes are unaffected and the integer contract
            # already leaks floor remainders by design.)
            nodes.join(
                contrib.groupBy(F.col("dst").alias("node")).agg(
                    F.sum("c").alias("mass")
                ),
                "node",
                "left",
            )
            .select(
                "node",
                (base + F.coalesce(F.col("mass"), F.lit(0)))
                .cast("long")
                .alias("pr"),
            )
            .persist()
        )
        nxt.count()  # materialize: cuts lineage each superstep (LRU-1)
        converged = False
        if tol is not None:
            delta = (
                nxt.join(pr.withColumnRenamed("pr", "__prev"), "node")
                .agg(F.max(F.abs(F.col("pr") - F.col("__prev"))))
                .first()[0]
            )
            converged = delta is not None and delta <= tol
        if pr_is_cached:
            pr.unpersist()
        pr, pr_is_cached = nxt, True
        if converged:
            break
    # LEFT join: sinks (no out-edges) report degree 0 instead of being
    # silently excluded from the result
    out = pr.join(deg, pr.node == deg.src, "left").select(
        "node",
        F.coalesce(F.col("out_deg"), F.lit(0)).cast("long").alias("degree"),
        "pr",
    )
    ed.unpersist()
    nodes.unpersist()
    return out
