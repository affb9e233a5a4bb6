"""ORC round-trip with pushdown, and binaryFile media ingestion feeding
the real header probe end-to-end."""

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.operators import multimodal as M
from sportstv_streaming_data_warehouse_spark.sources.fixtures import load_table
from sportstv_streaming_data_warehouse_spark.sources.formats import (
    read_media_dir,
    read_orc,
    write_orc,
)

from .conftest import SF001
from .test_multimodal import _gif, _jpeg, _png


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    path = str(tmp_path / "orders_orc")
    orders = load_table(spark, SF001, "orders")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    # same values through the ORC path
    a = sorted(tuple(str(v) for v in r) for r in orders.limit(100).collect())
    b = sorted(
        tuple(str(v) for v in r)
        for r in back.join(
            orders.limit(100).select("o_orderkey"), "o_orderkey", "left_semi"
        ).collect()
    )
    assert len(b) == len(a)
    # predicate reaches the ORC scan
    plan = (
        back.filter(F.col("o_orderkey") == 42)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "o_orderkey" in plan


def test_binaryfile_media_ingestion_probes_real_headers(spark, tmp_path):
    (tmp_path / "a.png").write_bytes(_png(640, 480))
    (tmp_path / "b.gif").write_bytes(_gif(320, 200))
    (tmp_path / "c.jpg").write_bytes(_jpeg(1920, 1080))
    (tmp_path / "junk.dat").write_bytes(b"\x00\x01\x02 not an image")

    media = read_media_dir(spark, str(tmp_path))
    assert media.count() == 4
    probed = M.probe_media(media.select("media_id", "data", "format"))
    got = {
        r["format_detected"]: (r["width"], r["height"])
        for r in probed.collect()
        if r["format_detected"] is not None
    }
    assert got == {"png": (640, 480), "gif": (320, 200), "jpeg": (1920, 1080)}
    # the extension hint survives alongside; the glob filter narrows the scan
    assert read_media_dir(spark, str(tmp_path), glob="*.png").count() == 1


def test_jsonl_permissive_quarantines_bad_lines(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from sportstv_streaming_data_warehouse_spark.sources.formats import read_jsonl

    p = str(tmp_path / "events.jsonl")
    with open(p, "w") as f:
        f.write('{"event_id": 1, "user_id": 10}\n')
        f.write('{"event_id": 2, "user_id": "not_a_number"}\n')  # bad type
        f.write("this is not json at all\n")                     # bad line
        f.write('{"event_id": 4, "user_id": 13}\n')
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = read_jsonl(spark, p, schema).cache()
    clean = df.filter(F.col("_corrupt_record").isNull())
    dirty = df.filter(F.col("_corrupt_record").isNotNull())
    assert {r["event_id"] for r in clean.collect()} == {1, 4}
    assert dirty.count() == 2
    # the quarantine column preserves the raw line for the audit trail
    raws = [r["_corrupt_record"] for r in dirty.collect()]
    assert any("not_a_number" in (s or "") for s in raws)
    assert any("not json" in (s or "") for s in raws)
    df.unpersist()


def test_parquet_schema_evolution_merges_additively(spark, tmp_path):
    from pyspark.sql import functions as F

    from sportstv_streaming_data_warehouse_spark.sources.formats import (
        read_parquet_evolving,
    )

    base = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], ["id", "name"]).write.parquet(
        base + "/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "name", "score"]
    ).write.parquet(base + "/batch=2")
    df = read_parquet_evolving(spark, base)
    assert set(df.columns) == {"id", "name", "score", "batch"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None   # old file: new column null-filled
    assert rows[2]["score"] == 9.5
    # aggregates treat the evolved column as nullable, not as zero
    agg = df.agg(
        F.count("score").alias("n"), F.sum("score").alias("s")
    ).collect()[0]
    assert agg["n"] == 1 and agg["s"] == 9.5
