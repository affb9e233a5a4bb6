"""Stream-stream attribution join: the streaming result must equal the
identical batch join over the same fixture (pair-complete inner join
within the horizon), and state must be watermark-bounded (both sides
carry watermarks + a time-range predicate)."""

import tempfile

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from sportstv_streaming_data_warehouse_spark.sources.fixtures import load_table
from sportstv_streaming_data_warehouse_spark.streaming.join import (
    attribution_join_stream,
)

from .conftest import SF001

RAW_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])

HORIZON_MIN = 60


def _split(df):
    clicks = df.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    signups = df.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("signup_ts"),
        F.col("event_id").alias("signup_id"),
    )
    return clicks, signups


def test_stream_join_matches_batch_join(spark):
    events_dir = tempfile.mkdtemp(prefix="events-join-")
    load_table(spark, SF001, "events").write.mode("overwrite").parquet(events_dir)
    stream = spark.readStream.schema(RAW_SCHEMA).parquet(events_dir)
    s_clicks, s_signups = _split(stream)
    joined = attribution_join_stream(
        s_clicks.withColumnRenamed("user_id", "user_id"),
        s_signups.withColumnRenamed("s_user_id", "user_id"),
        user_col="user_id",
        click_ts="ts",
        signup_ts="signup_ts",
        horizon_minutes=HORIZON_MIN,
    ).select("click_id", "signup_id")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib_pairs")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["click_id"], r["signup_id"])
        for r in spark.sql("SELECT * FROM attrib_pairs").collect()
    }
    spark.catalog.dropTempView("attrib_pairs")

    batch = load_table(spark, SF001, "events")
    b_clicks, b_signups = _split(batch)
    expected = {
        (r["click_id"], r["signup_id"])
        for r in b_clicks.join(
            b_signups,
            (F.col("user_id") == F.col("s_user_id"))
            & (F.col("signup_ts") <= F.col("ts"))
            & (
                F.col("signup_ts")
                >= F.col("ts") - F.expr(f"INTERVAL {HORIZON_MIN} MINUTES")
            ),
            "inner",
        ).collect()
    }
    assert len(expected) > 0, "fixture produced no attribution pairs"
    assert got == expected
