"""Streaming document chunking: chunk_documents is a stateless narrow
transformation, so the SAME operator runs unchanged under Structured
Streaming — batch↔stream output parity on identical input is the
contract (the same chaining used for the streaming fact and dedup)."""

import json
import os

from pyspark.sql.types import LongType, StringType, StructField, StructType

from sportstv_streaming_data_warehouse_spark.functions.text import chunk_documents

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def test_stream_chunking_matches_batch(spark, tmp_path):
    inp, outp, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    os.makedirs(inp)
    rows = [
        {"doc_id": i, "text": ("word%d " % i) * (i * 7)} for i in range(12)
    ]
    with open(os.path.join(inp, "d.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema(SCHEMA).json(inp)
    q = (
        chunk_documents(stream, "doc_id", "text", chunk_size=50, stride=40)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", outp)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch_df = spark.read.schema(SCHEMA).json(inp)
    expect = sorted(
        map(
            tuple,
            chunk_documents(
                batch_df, "doc_id", "text", chunk_size=50, stride=40
            ).collect(),
        )
    )
    got = sorted(map(tuple, spark.read.parquet(outp).collect()))
    assert got == expect
    assert len(got) > 0
