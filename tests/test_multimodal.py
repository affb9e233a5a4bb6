"""Multimodal plumbing tests: schema contracts, Arrow batch shapes,
determinism, and composition with the similarity operators."""

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.operators import multimodal as M
from sportstv_streaming_data_warehouse_spark.operators.similarity import brute_force_topk


def test_decode_metadata(spark):
    df = M.synthetic_media(spark, 20).repartition(4)
    out = M.decode_media(df)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "data", "format", "width", "height", "channels", "n_bytes",
    ]
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 20
    for mid, r in rows.items():
        assert r["width"] == 16 + (mid % 4) * 8
        assert r["height"] == 16 + (mid % 3) * 8
        assert r["channels"] == 3
        assert r["n_bytes"] == 9 + r["width"] * r["height"] * 3  # header+body


def test_resize_changes_dimensions(spark):
    df = M.synthetic_media(spark, 8)
    resized = M.decode_media(M.resize_media(df, 32, 32))
    for r in resized.collect():
        assert (r["width"], r["height"]) == (32, 32)
        assert r["n_bytes"] == 9 + 32 * 32 * 3


def test_resize_deterministic(spark):
    df = M.synthetic_media(spark, 5)
    a = {r["media_id"]: bytes(r["data"]) for r in M.resize_media(df, 24, 24).collect()}
    b = {r["media_id"]: bytes(r["data"]) for r in M.resize_media(df, 24, 24).collect()}
    assert a == b


def test_frame_sampling(spark):
    df = M.synthetic_media(spark, 6)
    frames = M.sample_frames(df, frame_bytes=256, every_n=2)
    rows = frames.collect()
    assert rows and all(r["frame_no"] % 2 == 0 for r in rows)
    # every media row yields at least one frame
    assert frames.select("media_id").distinct().count() == 6


def test_embeddings_feed_similarity(spark):
    df = M.synthetic_media(spark, 30)
    emb = M.embed_media(df, dim=16).withColumnRenamed("media_id", "vec_id")
    assert emb.schema["embedding"].dataType.simpleString() == "array<float>"
    queries = emb.filter(F.col("vec_id") < 3)
    topk = brute_force_topk(emb, queries, k=3)
    got = topk.groupBy("query_id").count().collect()
    assert len(got) == 3 and all(r["count"] == 3 for r in got)
    # unit-normalized vectors → cosine within [-1, 1]
    sims = [r["cosine_sim"] for r in topk.collect()]
    assert all(-1.0001 <= s <= 1.0001 for s in sims)
