"""Semantics tests for the round-5 fourth-batch operators with planted
inputs (graph shapes, rare-token docs, label layouts the fixture corpus
can't guarantee). DuckDB value parity is covered by
tests/test_oracle_parity.py."""

import math

import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans.catalog import (
    _PR_UNIT,
    QUERIES,
)

from .conftest import SF01


# ---------------------------------------------------------------------------
# x_pagerank_step — exact integer propagation on a known graph
# ---------------------------------------------------------------------------


def _pagerank(spark, pair_rows):
    pairs = spark.createDataFrame(pair_rows, ["pa", "pb"]).distinct()
    edges = pairs.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionAll(pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    s = (
        edges.join(deg, "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(
            F.sum(
                F.floor(F.lit(_PR_UNIT) / F.col("out_deg")).cast("long")
            ).alias("inbound_mass")
        )
    )
    return {
        r["node"]: r
        for r in s.join(deg, s.node == deg.src)
        .select(
            "node",
            F.col("out_deg").alias("degree"),
            "inbound_mass",
            (F.lit(15 * _PR_UNIT) + F.lit(85) * F.col("inbound_mass"))
            .cast("long")
            .alias("pr_scaled"),
        )
        .collect()
    }


def test_pagerank_star_graph(spark):
    # star: hub 1 joined to leaves 2,3,4. deg(hub)=3, deg(leaf)=1.
    # hub receives 3 * floor(U/1) = 3U; each leaf receives floor(U/3).
    out = _pagerank(spark, [(1, 2), (1, 3), (1, 4)])
    U = _PR_UNIT
    assert out[1]["degree"] == 3
    assert out[1]["inbound_mass"] == 3 * U
    assert out[2]["inbound_mass"] == U // 3
    assert out[2]["pr_scaled"] == 15 * U + 85 * (U // 3)
    # hub outranks leaves
    assert out[1]["pr_scaled"] > out[2]["pr_scaled"]


def test_pagerank_symmetric_pair(spark):
    # single edge: both nodes degree 1, equal rank, mass exactly U
    out = _pagerank(spark, [(10, 20)])
    assert out[10]["inbound_mass"] == out[20]["inbound_mass"] == _PR_UNIT
    assert out[10]["pr_scaled"] == out[20]["pr_scaled"]


def test_pagerank_catalog_mass_conservation(spark):
    # total inbound mass == sum over nodes of deg*floor(U/deg) <= E*U,
    # and every node's pr exceeds the damping floor
    rows = QUERIES["x_pagerank_step"](spark, SF01).collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert r["pr_scaled"] >= 15 * _PR_UNIT
        assert r["inbound_mass"] >= _PR_UNIT // r["degree"] if r["degree"] else True


# ---------------------------------------------------------------------------
# x_weighted_sample — weight monotonicity of the E-S keys
# ---------------------------------------------------------------------------


def test_weighted_sample_same_u_prefers_heavier(spark):
    # two docs with IDENTICAL text (same fingerprint -> same u) but the
    # key divides by weight: heavier weight => key closer to 0 => ranked
    # first. Replicate the key expression inline on a planted frame.
    from sportstv_streaming_data_warehouse_spark.functions import text as T

    docs = spark.createDataFrame(
        [(1, "alpha beta", 10), (2, "alpha beta", 1000)],
        ["doc_id", "text", "n_chars"],
    )
    lnu_micro = F.round(
        F.log((T.fingerprint(F.col("text")) % 1000000 + 0.5) / 1000000.0)
        * 1000000.0,
        0,
    ).cast("long")
    out = {
        r["doc_id"]: r["sample_key"]
        for r in docs.select(
            "doc_id",
            (lnu_micro.cast("double") / F.col("n_chars")).alias("sample_key"),
        ).collect()
    }
    assert out[2] > out[1]  # ln(u) < 0: dividing by larger w is larger


def test_weighted_sample_catalog_contract(spark):
    rows = QUERIES["x_weighted_sample"](spark, SF01).collect()
    assert len(rows) == 50
    keys = [(-r["sample_key"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    assert all(r["sample_key"] < 0 for r in rows)  # ln(u)/w is negative
    assert all(r["n_chars"] > 0 for r in rows)


# ---------------------------------------------------------------------------
# x_unigram_surprisal — rare tokens score higher than common ones
# ---------------------------------------------------------------------------


def test_surprisal_rare_doc_scores_higher(spark):
    from sportstv_streaming_data_warehouse_spark.functions import text as T

    # corpus: 'the' appears 9x, 'zyzzyva' once. doc 1 = common tokens,
    # doc 2 = the rare token.
    docs = spark.createDataFrame(
        [(1, "the the the the the the the the the"), (2, "zyzzyva")],
        ["doc_id", "text"],
    )
    tok = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("token"))
    tc = tok.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    freq = tc.groupBy("token").agg(F.sum("c").alias("f"))
    tot = freq.agg(F.sum("f").alias("t"))
    terms = (
        tc.join(freq, "token")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "c",
            F.round(
                F.col("c") * F.log(F.col("t").cast("double") / F.col("f"))
                * 1000000.0,
                0,
            )
            .cast("long")
            .alias("q"),
        )
    )
    out = {
        r["doc_id"]: r["surprisal_nats"]
        for r in terms.groupBy("doc_id")
        .agg(
            F.round(F.sum("q") / 1000000.0 / F.sum("c"), 4).alias(
                "surprisal_nats"
            )
        )
        .collect()
    }
    # doc 1: ln(10/9) ~ 0.105; doc 2: ln(10/1) ~ 2.303
    assert abs(out[1] - math.log(10 / 9)) < 1e-3
    assert abs(out[2] - math.log(10)) < 1e-3
    assert out[2] > out[1]


# ---------------------------------------------------------------------------
# x_hard_negatives — argmax picks the most-similar different-label vector
# ---------------------------------------------------------------------------


def test_hard_negatives_catalog_contract(spark):
    rows = QUERIES["x_hard_negatives"](spark, SF01).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["label"] != r["hard_negative_label"]
        assert -1.0001 <= r["cosine_sim"] <= 1.0001
    # one row per anchor
    anchors = [r["vec_id"] for r in rows]
    assert len(anchors) == len(set(anchors))


def test_hard_negatives_planted_argmax(spark):
    # three vectors in one LSH bucket by construction (identical
    # directions): anchor label 0; candidates label 1 at cos 1.0 and
    # label 1 at cos ~0.7 -> the closer one must win; the same-label
    # twin must be ignored.
    import sportstv_streaming_data_warehouse_spark.operators.similarity as S
    from sportstv_streaming_data_warehouse_spark.plans.catalog import _EC

    dim = _EC["dim"]
    base = [1.0] + [0.0] * (dim - 1)
    tilted = [0.7] + [0.7] + [0.0] * (dim - 2)  # cos ~0.707 to base
    emb = spark.createDataFrame(
        [
            (1, base, 0),
            (2, base, 1),        # different label, identical -> cos 1.0
            (3, tilted, 1),      # different label, cos ~0.707
            (4, base, 0),        # same label twin: never a negative for 1
        ],
        ["vec_id", "embedding", "label"],
    )
    pairs = S.banded_cosine_pairs(
        emb,
        threshold=-1.0,
        dim=dim,
        planes_per_band=_EC["planes_per_band"],
        n_bands=_EC["n_bands"],
        seed=_EC["seed"],
        max_bucket_size=_EC["cap"],
    )
    sym = pairs.select(
        F.col("id_a").alias("anchor"), F.col("id_b").alias("neg"),
        F.col("cosine_sim").alias("cos"),
    ).unionAll(
        pairs.select(
            F.col("id_b").alias("anchor"), F.col("id_a").alias("neg"),
            F.col("cosine_sim").alias("cos"),
        )
    )
    lbl = emb.select("vec_id", "label")
    j = (
        sym.join(
            lbl.select(F.col("vec_id").alias("anchor"),
                       F.col("label").alias("anchor_label")),
            "anchor",
        )
        .join(
            lbl.select(F.col("vec_id").alias("neg"),
                       F.col("label").alias("neg_label")),
            "neg",
        )
        .filter(F.col("anchor_label") != F.col("neg_label"))
    )
    best = j.groupBy("anchor").agg(
        F.max(F.struct(F.col("cos"), (-F.col("neg")).alias("n"),
                       F.col("neg"))).alias("b")
    )
    out = {r["anchor"]: (r["b"]["neg"], r["b"]["cos"]) for r in best.collect()}
    # anchors 1 and 2 are identical vectors -> share every bucket; the
    # exact same-direction negative must win at cos 1.0
    assert out[1][0] == 2 and out[1][1] == pytest.approx(1.0)
    assert out[2][0] in (1, 4) and out[2][1] == pytest.approx(1.0)
    # the tilted vector only pairs when the LSH bands happen to agree —
    # if mined, its negative must be a label-0 vector at cos ~0.707
    if 3 in out:
        assert out[3][0] in (1, 4)
        assert out[3][1] == pytest.approx(0.707, abs=0.01)
