"""The whole reference ETL in streaming mode: the SAME
star.enrich_transactions code path (snowflake dims, broadcast lookups,
last-write-wins inference, validity filter, NULL fill) applied to a
transaction STREAM, rolled up per day, must equal the batch fact —
one codebase, two execution modes (the charter's warehouse-ingestion
north star)."""

import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans import star

from .fixtures_ref import generate


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    data = {k: spark.createDataFrame(v) for k, v in generate(3000, 0 or 10).items()}
    uc = star.build_user_country(
        data["subscribers"], data["postal2city"], data["cities"]
    )
    asp = data["assets"].filter(
        F.col("sport").isNotNull() & (F.col("sport") != "")
    ).select("asset_id", "sport")

    core = ["transaction_id", "user_id", "asset_id", "streaming_date",
            "minutes_streamed", "completed"]
    # pandas Nones arrive as doubles — write the drops cleanly typed so
    # the stream schema and the batch twin see identical data
    txns = (
        data["streaming_txns"].select(core)
        .withColumn("minutes_streamed", F.col("minutes_streamed").cast("int"))
        .withColumn("completed", F.col("completed").cast("int"))
    )
    drop_dir = str(tmp_path_factory.mktemp("txn-drops"))
    txns.coalesce(3).write.mode("overwrite").json(drop_dir)
    return {"uc": uc, "asp": asp, "drop_dir": drop_dir}


def test_streaming_etl_matches_batch_fact(spark, setup):
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("transaction_id", LongType()),
        StructField("user_id", LongType()),
        StructField("asset_id", StringType()),
        StructField("streaming_date", StringType()),
        StructField("minutes_streamed", IntegerType()),
        StructField("completed", IntegerType()),
    ])
    stream = spark.readStream.schema(schema).json(setup["drop_dir"])

    # IDENTICAL enrichment code as the batch path (stream-static joins,
    # inference, filters and fills all stream-capable)
    enriched = star.enrich_transactions(stream, setup["uc"], setup["asp"])

    rollup = (
        enriched.withColumn("ts", F.col("streaming_date").cast("timestamp"))
        .withWatermark("ts", "10 days")
        .groupBy(F.window("ts", "1 day").alias("w"), "country_id", "sport")
        .agg(
            F.count("*").alias("transaction_count"),
            F.approx_count_distinct("user_id", 0.01).alias("unique_user_estimate"),
            F.sum("minutes_streamed").cast("long").alias("total_minutes_streamed"),
            F.sum(F.col("completed").cast("int")).cast("long").alias("completed_streams"),
        )
        .select(
            F.to_date("w.start").alias("day"), "country_id", "sport",
            "transaction_count", "unique_user_estimate",
            "total_minutes_streamed", "completed_streams",
        )
    )
    q = (
        rollup.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_fact")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["day"].isoformat(), r["country_id"], r["sport"]): r
        for r in spark.sql("SELECT * FROM stream_fact").collect()
    }

    batch_txns = spark.read.schema(schema).json(setup["drop_dir"])
    batch_fact = star.build_fact(
        star.enrich_transactions(batch_txns, setup["uc"], setup["asp"])
    )

    # Full value-hash parity (same comparator semantics as the DuckDB
    # driver gate) on the deterministic columns: since build_fact is
    # itself oracle-verified (star_fact_events), this chains the
    # streaming sink to the DuckDB gate. The HLL estimate is excluded —
    # exact distinct is unsupported in a streaming aggregation.
    from .parity import compare_frames

    det_cols = ["transaction_count", "total_minutes_streamed", "completed_streams"]
    stream_det = spark.table("stream_fact").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "country_id",
        "sport",
        *[F.col(c).cast("long").alias(c) for c in det_cols],
    )
    batch_det = batch_fact.select(
        F.to_date(F.col("date_id").cast("string"), "yyyyMMdd").cast("string").alias("day"),
        "country_id",
        F.col("sport_name").alias("sport"),
        *[F.col(c).cast("long").alias(c) for c in det_cols],
    )
    compare_frames(stream_det, batch_det, "streaming_star_etl")
    spark.catalog.dropTempView("stream_fact")
    expected = {}
    for r in batch_fact.collect():
        d = str(r["date_id"])
        key = (f"{d[:4]}-{d[4:6]}-{d[6:]}", r["country_id"], r["sport_name"])
        expected[key] = r

    assert set(got) == set(expected)
    for key, g in got.items():
        e = expected[key]
        assert g["transaction_count"] == e["transaction_count"], key
        assert g["total_minutes_streamed"] == e["total_minutes_streamed"], key
        assert g["completed_streams"] == e["completed_streams"], key
        # streaming distinct is HLL (exact unsupported in streaming agg):
        # rsd=0.01 keeps it within ~3% of the exact batch count
        exact = e["unique_user_count"]
        assert abs(g["unique_user_estimate"] - exact) <= max(2, 0.05 * exact), key
