"""Connected components over near-dup pairs: known graph topologies,
transitivity (A~B, B~C ⇒ one cluster even if A!~C), and end-to-end
cluster dedup keeping one representative per component."""

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.operators.dedup import (
    connected_components,
    dedup_by_clusters,
    token_jaccard_pairs,
)


def test_known_topologies(spark):
    # chain 1-2-3-4, triangle 10-11-12, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["id_a", "id_b"],
    )
    comp = {
        r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()
    }
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == comp[12] == 10
    assert comp[20] == comp[21] == 20
    assert len({comp[1], comp[10], comp[20]}) == 3


def test_transitive_closure_long_chain(spark):
    # a 30-node path: worst case for propagation (diameter 29)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["id_a", "id_b"]
    )
    comp = connected_components(pairs, max_iterations=40)
    labels = {r["cluster_id"] for r in comp.collect()}
    assert labels == {0}


def test_cluster_dedup_end_to_end(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "the quick brown fox jumps over a lazy dog"),
            (4, "completely different content about spark engines"),
            (5, "another unrelated document entirely on its own"),
        ],
        ["doc_id", "text"],
    )
    pairs = token_jaccard_pairs(docs, "doc_id", "text", threshold=0.6)
    # 1~2, 1~3 (and possibly 2~3): one cluster either way by transitivity
    kept = sorted(
        r["doc_id"] for r in dedup_by_clusters(docs, pairs, "doc_id").collect()
    )
    assert kept == [1, 4, 5]
