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


def _png(w, h):
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + len(ihdr).to_bytes(4, "big") + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
    )


def _gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 10


def _jpeg(w, h):
    # SOI, APP0 (JFIF stub), SOF0 frame header, EOI
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof_payload = b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03" + b"\x00" * 9
    sof = b"\xff\xc0" + (2 + len(sof_payload)).to_bytes(2, "big") + sof_payload
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def test_probe_real_container_headers(spark):
    blobs = [
        (1, _png(640, 480), "?"),
        (2, _gif(320, 200), "?"),
        (3, _jpeg(1920, 1080), "?"),
        (4, M.make_blob(32, 24), "?"),
        (5, b"\x00garbage\x01\x02", "?"),
        (6, None, "?"),
        (7, b"\xff\xd8\xff\xd9", "?"),  # JPEG magic, no SOF
        # SOF's width field IS the final two bytes (truncated but
        # sufficient) — regression for the marker-walk off-by-one
        (8, b"\xff\xd8" + b"\xff\xc0" + (9).to_bytes(2, "big") + b"\x08"
            + (480).to_bytes(2, "big") + (640).to_bytes(2, "big"), "?"),
        # PNG claiming 0xFFFFFFFF dims: must probe as (png, None, None),
        # not overflow the int32 Arrow cast
        (9, _png(0xFFFFFFFF, 0xFFFFFFFF), "?"),
        # legal 0xFF fill padding before the SOF marker code
        (10, b"\xff\xd8" + b"\xff\xff\xff\xc0" + (11).to_bytes(2, "big")
             + b"\x08" + (240).to_bytes(2, "big") + (320).to_bytes(2, "big")
             + b"\x01" + b"\xff\xd9", "?"),
        # EOI immediately after SOI: walk must stop cleanly at 0xD9
        (11, b"\xff\xd8\xff\xd9\x00\x00\x00\x00\x00", "?"),
        # PNG claiming zero dims: invalid, probe dims as null
        (12, _png(0, 0), "?"),
    ]
    df = spark.createDataFrame(blobs, M.IMAGE_SCHEMA).repartition(3)
    got = {r["media_id"]: r for r in M.probe_media(df).collect()}
    assert (got[1]["format_detected"], got[1]["width"], got[1]["height"]) == ("png", 640, 480)
    assert (got[2]["format_detected"], got[2]["width"], got[2]["height"]) == ("gif", 320, 200)
    assert (got[3]["format_detected"], got[3]["width"], got[3]["height"]) == ("jpeg", 1920, 1080)
    assert (got[4]["format_detected"], got[4]["width"], got[4]["height"]) == ("synm", 32, 24)
    assert got[5]["format_detected"] is None and got[5]["width"] is None
    assert got[6]["format_detected"] is None
    assert got[7]["format_detected"] == "jpeg" and got[7]["width"] is None
    assert (got[8]["format_detected"], got[8]["width"], got[8]["height"]) == ("jpeg", 640, 480)
    assert (got[9]["format_detected"], got[9]["width"], got[9]["height"]) == ("png", None, None)
    assert (got[10]["format_detected"], got[10]["width"], got[10]["height"]) == ("jpeg", 320, 240)
    assert got[11]["format_detected"] == "jpeg" and got[11]["width"] is None
    assert (got[12]["format_detected"], got[12]["width"], got[12]["height"]) == ("png", None, None)


def test_ahash_deterministic_and_identical_blobs_collide(spark):
    from sportstv_streaming_data_warehouse_spark.operators.multimodal import (
        IMAGE_SCHEMA,
        ahash_media,
        make_blob,
    )

    same = make_blob(16, 16, 3, seed=7)
    rows = [(1, same, "synm"), (2, same, "synm"), (3, make_blob(16, 16, 3, 8), "synm")]
    df = spark.createDataFrame(rows, IMAGE_SCHEMA)
    got = {r["media_id"]: r["ahash"] for r in ahash_media(df).collect()}
    assert got[1] == got[2]             # identical pixels, identical hash
    assert got[1] is not None
    # two runs agree bit-for-bit (determinism)
    again = {r["media_id"]: r["ahash"] for r in ahash_media(df).collect()}
    assert got == again


def test_ahash_garbage_blob_yields_null(spark):
    from sportstv_streaming_data_warehouse_spark.operators.multimodal import (
        IMAGE_SCHEMA,
        ahash_media,
    )

    df = spark.createDataFrame(
        [(1, b"not a blob", "junk"), (2, None, "none")], IMAGE_SCHEMA
    )
    got = {r["media_id"]: r["ahash"] for r in ahash_media(df).collect()}
    assert got == {1: None, 2: None}


def test_image_near_duplicates_find_planted_twins(spark):
    import struct as _st

    from sportstv_streaming_data_warehouse_spark.operators.multimodal import (
        IMAGE_SCHEMA,
        ahash_media,
        image_near_duplicates,
        make_blob,
    )

    base = make_blob(16, 16, 3, seed=21)
    # perturb ONE pixel's bytes: at most a few aHash cells flip
    body = bytearray(base)
    body[9] = (body[9] + 120) % 256
    near = bytes(body)
    rows = [
        (1, base, "synm"),
        (2, base, "synm"),       # exact twin: hamming 0
        (3, near, "synm"),       # near twin: small hamming
        (4, make_blob(16, 16, 3, 99), "synm"),   # unrelated
        (5, make_blob(24, 16, 3, 100), "synm"),  # unrelated
    ]
    df = spark.createDataFrame(rows, IMAGE_SCHEMA)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_duplicates(df, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    # the perturbed twin is within the hamming budget of both copies
    h13 = {k: v for k, v in pairs.items() if k in ((1, 3), (2, 3))}
    assert h13 and all(v <= 3 for v in h13.values())
    # unrelated images (independent random pixels) never pair
    assert all(4 not in k and 5 not in k for k in pairs)


def test_ahash_sub_grid_images_yield_null_not_zero(spark):
    # round-5 review regression: images smaller than the 8x8 grid used
    # to hash to exactly 0 (NaN cell means -> all-False bits) and
    # spuriously pair with every other small image
    from sportstv_streaming_data_warehouse_spark.operators.multimodal import (
        IMAGE_SCHEMA,
        ahash_media,
        image_near_duplicates,
        make_blob,
    )

    rows = [
        (1, make_blob(4, 4, 3, seed=1), "synm"),
        (2, make_blob(6, 6, 3, seed=2), "synm"),
        (3, make_blob(16, 16, 3, seed=3), "synm"),
    ]
    df = spark.createDataFrame(rows, IMAGE_SCHEMA)
    got = {r["media_id"]: r["ahash"] for r in ahash_media(df).collect()}
    assert got[1] is None and got[2] is None
    assert got[3] is not None
    assert image_near_duplicates(df).count() == 0


def test_hamming_pairs_rejects_unsound_budget(spark):
    import pytest

    from sportstv_streaming_data_warehouse_spark.operators.dedup import (
        hamming_pairs,
    )

    sig = spark.createDataFrame([(1, 0), (2, 15)], ["id", "h"])
    with pytest.raises(ValueError):
        hamming_pairs(sig, "id", "h", max_hamming=4)
    with pytest.raises(ValueError):
        hamming_pairs(sig, "id", "h", max_hamming=-1)
