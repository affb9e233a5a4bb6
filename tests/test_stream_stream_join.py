"""Stream-stream join: correlating two live streams (starts ⋈ finishes)
within a time bound — the Spark capability that replaces the reference's
batch-only correlation queries for live pipelines. Both sides carry
watermarks so join state is evicted once the interval passes."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

START_SCHEMA = StructType(
    [
        StructField("start_ts", TimestampType()),
        StructField("txn_id", LongType()),
        StructField("sport", StringType()),
    ]
)
FINISH_SCHEMA = StructType(
    [
        StructField("finish_ts", TimestampType()),
        StructField("txn_id", LongType()),
        StructField("completed", LongType()),
    ]
)


def _write(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_stream_interval_join(spark, tmp_path):
    starts_dir, fin_dir = str(tmp_path / "starts"), str(tmp_path / "fins")
    _write(
        starts_dir,
        "s.json",
        [
            {"start_ts": "2024-06-01T10:00:00", "txn_id": 1, "sport": "Ice Hockey"},
            {"start_ts": "2024-06-01T10:05:00", "txn_id": 2, "sport": "Ski Jumping"},
            {"start_ts": "2024-06-01T10:10:00", "txn_id": 3, "sport": "Ice Hockey"},
        ],
    )
    _write(
        fin_dir,
        "f.json",
        [
            {"finish_ts": "2024-06-01T11:30:00", "txn_id": 1, "completed": 1},
            {"finish_ts": "2024-06-01T10:45:00", "txn_id": 2, "completed": 1},
            # txn 3 finishes outside the 2h join bound → must NOT match
            {"finish_ts": "2024-06-01T14:00:00", "txn_id": 3, "completed": 1},
        ],
    )

    starts = (
        spark.readStream.schema(START_SCHEMA).json(starts_dir)
        .withWatermark("start_ts", "1 hour")
        .alias("starts")
    )
    fins = (
        spark.readStream.schema(FINISH_SCHEMA).json(fin_dir)
        .withWatermark("finish_ts", "1 hour")
        .alias("fins")
    )
    joined = starts.join(
        fins,
        F.expr(
            """
            starts.txn_id = fins.txn_id AND
            finish_ts BETWEEN start_ts AND start_ts + INTERVAL 2 HOURS
            """
        ),
    ).select("starts.txn_id", "sport", "start_ts", "finish_ts")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["txn_id"] for r in spark.sql("SELECT * FROM ssj").collect()}
    spark.catalog.dropTempView("ssj")
    assert got == {1, 2}  # txn 3 excluded by the interval bound
