"""Iterative PageRank (operators/graph.py): exact equality against a
pure-python replica of the identical integer recurrence, plus ranking
properties on known graph shapes."""

from collections import defaultdict

from sportstv_streaming_data_warehouse_spark.operators.graph import (
    DEFAULT_UNIT,
    pagerank,
    symmetric_edges,
)


def _python_pagerank(pair_list, n_iter, unit=DEFAULT_UNIT):
    edges = []
    for a, b in pair_list:
        edges.append((a, b))
        edges.append((b, a))
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    pr = {v: unit for v in deg}
    base = round(0.15 * unit)
    for _ in range(n_iter):
        mass = defaultdict(int)
        for s, d in edges:
            mass[d] += (85 * pr[s]) // (100 * deg[s])
        pr = {v: base + mass[v] for v in deg}
    return pr, dict(deg)


def _spark_pagerank(spark, pair_list, n_iter):
    pairs = spark.createDataFrame(pair_list, ["a", "b"])
    out = pagerank(symmetric_edges(pairs, "a", "b"), n_iter=n_iter)
    return {r["node"]: (r["degree"], r["pr"]) for r in out.collect()}


def test_pagerank_exact_match_with_python_model(spark):
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (5, 6)]
    for n_iter in (1, 3, 5):
        got = _spark_pagerank(spark, pairs, n_iter)
        exp_pr, exp_deg = _python_pagerank(pairs, n_iter)
        assert set(got) == set(exp_pr)
        for v in exp_pr:
            assert got[v] == (exp_deg[v], exp_pr[v]), (v, n_iter)


def test_pagerank_star_hub_dominates_and_converges_monotone(spark):
    # star K1,5: hub must outrank leaves at every depth, and the
    # hub/leaf ordering must be stable across iterations
    pairs = [(0, i) for i in range(1, 6)]
    prev_hub = None
    for n_iter in (1, 2, 4):
        got = _spark_pagerank(spark, pairs, n_iter)
        hub, leaf = got[0][1], got[1][1]
        assert hub > leaf
        # all leaves identical by symmetry
        assert len({got[i][1] for i in range(1, 6)}) == 1
        if prev_hub is not None:
            # geometric decay: successive iterations move the hub less
            assert abs(hub - prev_hub) <= abs(prev_hub)
        prev_hub = hub


def test_pagerank_ring_is_uniform(spark):
    # cycle: perfect symmetry -> every node identical at any depth
    pairs = [(i, (i + 1) % 6) for i in range(6)]
    got = _spark_pagerank(spark, pairs, 4)
    assert len({pr for _, pr in got.values()}) == 1
    # degree 2 everywhere; ring mass conserved up to floor leakage
    total = sum(pr for _, pr in got.values())
    assert total <= 6 * DEFAULT_UNIT
    assert total >= 6 * DEFAULT_UNIT - 6 * 100  # tiny floor leak only


def test_pagerank_validates_n_iter(spark):
    import pytest

    pairs = spark.createDataFrame([(1, 2)], ["a", "b"])
    with pytest.raises(ValueError):
        pagerank(symmetric_edges(pairs, "a", "b"), n_iter=0)


def test_pagerank_tol_early_stop_matches_fixed_depth(spark):
    # ring graph converges after ONE step (uniform stays uniform):
    # tol-mode must stop early yet return the same ranks as any deeper
    # fixed-depth run
    pairs = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], ["a", "b"]
    )
    edges = symmetric_edges(pairs, "a", "b")
    deep = {r["node"]: r["pr"] for r in pagerank(edges, n_iter=6).collect()}
    early = {
        r["node"]: r["pr"]
        for r in pagerank(edges, n_iter=6, tol=0).collect()
    }
    assert early == deep


def test_pagerank_tol_validation(spark):
    import pytest

    pairs = spark.createDataFrame([(1, 2)], ["a", "b"])
    with pytest.raises(ValueError):
        pagerank(symmetric_edges(pairs, "a", "b"), n_iter=3, tol=-1)


def _python_pagerank_directed(edge_list, n_iter, unit=DEFAULT_UNIT):
    """Replica of the identical integer recurrence on a DIRECTED edge
    list: full node universe (src | dst), base mass kept for nodes with
    no in-edges, dangling mass absorbed by sinks."""
    deg = defaultdict(int)
    for s, _ in edge_list:
        deg[s] += 1
    nodes = {v for e in edge_list for v in e}
    pr = {v: unit for v in nodes}
    base = round(0.15 * unit)
    for _ in range(n_iter):
        mass = defaultdict(int)
        for s, d in edge_list:
            mass[d] += (85 * pr[s]) // (100 * deg[s])
        pr = {v: base + mass[v] for v in nodes}
    return pr, {v: deg.get(v, 0) for v in nodes}


def test_pagerank_directed_keeps_sources_and_sinks(spark):
    # chain 1 -> 2 -> 3 plus a feeder 4 -> 2: node 1 and 4 are
    # source-only (no in-edges — must KEEP base mass every step, not
    # vanish from the state), node 3 is a sink (no out-edges — must
    # appear in the result with degree 0). The round-5 advice finding.
    edge_list = [(1, 2), (2, 3), (4, 2)]
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    for n_iter in (1, 2, 4):
        got = {
            r["node"]: (r["degree"], r["pr"])
            for r in pagerank(edges, n_iter=n_iter).collect()
        }
        exp_pr, exp_deg = _python_pagerank_directed(edge_list, n_iter)
        assert set(got) == {1, 2, 3, 4}
        for v in exp_pr:
            assert got[v] == (exp_deg[v], exp_pr[v]), (v, n_iter)
    # semantics at depth 4: the sink drains 85% of the hub's mass each
    # step (deg(2)=1), so 3 > 2 > sources; sources hold exactly base
    # mass after the first step
    assert got[3][1] > got[2][1] > got[1][1]
    assert got[1][1] == got[4][1] == round(0.15 * DEFAULT_UNIT)
    assert got[3][0] == 0  # sink reports out-degree 0
