"""Streaming quantile-sketch twin: finalized weekly sketch rows must be
BIT-EQUAL to the batch (event_type, wk, bucket) histogram on the same
data — additivity makes the stream exact, not approximate-on-top-of-
approximate — and quantiles extracted from the streamed sketch must
equal the batch catalog query's estimates."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from sportstv_streaming_data_warehouse_spark.operators.sketches import (
    qsketch_bucket,
)
from sportstv_streaming_data_warehouse_spark.streaming.qsketch import (
    qsketch_stream,
    quantiles_from_sketch,
)


def _drop(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, in_path, out_path, ckpt):
    stream = spark.readStream.schema(
        "event_type string, value string, ts timestamp"
    ).json(in_path)
    typed = stream.withColumn(
        "value", F.col("value").cast(DecimalType(18, 3))
    )
    q = (
        qsketch_stream(typed, delay="1 day")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _event_rows(spark):
    from sportstv_streaming_data_warehouse_spark.sources.fixtures import (
        load_table,
    )

    from .conftest import SF001

    ev = load_table(spark, SF001, "events").select(
        "event_type", "value", "ts"
    )
    return [
        {
            "event_type": r["event_type"],
            "value": str(r["value"]),
            "ts": r["ts"].strftime("%Y-%m-%d %H:%M:%S.%f"),
        }
        for r in ev.collect()
    ]


def test_streamed_weekly_sketch_bit_equal_to_batch(spark, tmp_path):
    """Out-of-order arrival WITHIN the watermark contract: drop 1 is
    everything up to a cut instant except a deferred mid-slice; drop 2
    delivers that slice — earlier event-time than data already seen,
    but inside the 1-day horizon of drop 1's max — plus the remainder.
    (Events later than the watermark horizon would be DROPPED by
    design; this split keeps the disorder genuine and the data
    complete.)"""
    import datetime

    rows = sorted(_event_rows(spark), key=lambda r: r["ts"])
    cut = datetime.datetime.strptime(
        rows[int(len(rows) * 0.6)]["ts"], "%Y-%m-%d %H:%M:%S.%f"
    )
    lo, hi = cut - datetime.timedelta(hours=12), cut - datetime.timedelta(
        hours=6
    )

    def t(r):
        return datetime.datetime.strptime(r["ts"], "%Y-%m-%d %H:%M:%S.%f")

    b0 = [r for r in rows if t(r) <= cut and not lo < t(r) <= hi]
    deferred = [r for r in rows if lo < t(r) <= hi]
    b1 = deferred + [r for r in rows if t(r) > cut]
    assert deferred, "mid-slice must defer something for the test to bite"
    in_path, out_path, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    _drop(in_path, "b0.json", b0[::-1])
    _run(spark, in_path, out_path, ckpt)
    _drop(in_path, "b1.json", b1[::-1])
    _run(spark, in_path, out_path, ckpt)
    _drop(
        in_path,
        "b2.json",
        [{"event_type": "sentinel", "value": "1.0",
          "ts": "2030-01-01 00:00:00"}],
    )
    _run(spark, in_path, out_path, ckpt)

    got = {
        (r["event_type"], r["wk"], r["bucket"]): r["c"]
        for r in spark.read.parquet(out_path).collect()
        if r["event_type"] != "sentinel"
    }

    from sportstv_streaming_data_warehouse_spark.sources.fixtures import (
        load_table,
    )

    from .conftest import SF001

    ev = load_table(spark, SF001, "events")
    m = (F.col("value").cast(DecimalType(18, 3)) * 1000).cast("long")
    batch = (
        ev.groupBy(
            "event_type",
            F.floor(
                F.datediff(
                    F.to_date("ts"), F.lit("1970-01-01").cast("date")
                )
                / 7
            )
            .cast("long")
            .alias("wk"),
            qsketch_bucket(m).alias("bucket"),
        )
        .agg(F.count("*").alias("c"))
        .collect()
    )
    want = {(r["event_type"], r["wk"], r["bucket"]): r["c"] for r in batch}
    assert got == want


def test_quantiles_from_streamed_sketch_match_catalog(spark, tmp_path):
    """End-to-end: stream → finalized sketch rows → batch extraction
    equals the batch catalog query's sketch-side estimates."""
    from sportstv_streaming_data_warehouse_spark.plans.catalog import (
        QUERIES,
    )

    from .conftest import SF001

    rows = _event_rows(spark)
    in_path, out_path, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    _drop(in_path, "b0.json", rows)
    _drop(
        in_path,
        "b1.json",
        [{"event_type": "sentinel", "value": "1.0",
          "ts": "2030-01-01 00:00:00"}],
    )
    _run(spark, in_path, out_path, ckpt)

    sketch = spark.read.parquet(out_path).filter(
        F.col("event_type") != "sentinel"
    )
    got = {
        (r["event_type"], r["wk"]): (
            r["n"], r["p50_est_milli"], r["p95_est_milli"]
        )
        for r in quantiles_from_sketch(sketch).collect()
    }
    want = {
        (r["event_type"], r["wk"]): (
            r["n"], r["p50_est_milli"], r["p95_est_milli"]
        )
        for r in QUERIES["h_sketch_rollup_quantile"](spark, SF001).collect()
    }
    assert got == want
