"""Stream-static join: the streaming re-expression of the ETL's dim
enrichment — a transaction stream joins the static user→country dim
(broadcast per micro-batch) and rolls up to the daily grain; the result
must match the batch pipeline on the same data."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TXN_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("sport", StringType()),
        StructField("minutes_streamed", IntegerType()),
    ]
)


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    rows = [
        {"ts": f"2024-06-0{1 + i % 3}T10:{i % 60:02d}:00", "user_id": i % 7,
         "sport": ["Ice Hockey", "Ski Jumping"][i % 2], "minutes_streamed": 5 + i % 20}
        for i in range(200)
    ]
    with open(os.path.join(in_dir, "txns.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    user_country = spark.createDataFrame(
        [(u, f"C{u % 3}") for u in range(7)], ["user_id", "country"]
    )

    stream = spark.readStream.schema(TXN_SCHEMA).json(in_dir)
    enriched = stream.join(F.broadcast(user_country), "user_id")  # stream-static
    rollup = (
        enriched.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"), "country", "sport")
        .agg(
            F.count("*").alias("n"),
            F.sum("minutes_streamed").cast("long").alias("minutes"),
        )
        .select(F.to_date("w.start").alias("day"), "country", "sport", "n", "minutes")
    )
    q = (
        rollup.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ss_join")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["day"].isoformat(), r["country"], r["sport"]): (r["n"], r["minutes"])
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }
    spark.catalog.dropTempView("ss_join")

    batch = (
        spark.read.schema(TXN_SCHEMA).json(in_dir)
        .join(user_country, "user_id")
        .groupBy(F.to_date("ts").alias("day"), "country", "sport")
        .agg(
            F.count("*").alias("n"),
            F.sum("minutes_streamed").cast("long").alias("minutes"),
        )
    )
    expected = {
        (r["day"].isoformat(), r["country"], r["sport"]): (r["n"], r["minutes"])
        for r in batch.collect()
    }
    assert got == expected
