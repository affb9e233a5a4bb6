"""Streaming quality gate: valid rows reach the rollup sink, violating
rows land in the dead-letter sink labeled with every rule they broke,
and nothing is lost (good + bad == input)."""

import json
import os

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans import quality as Q
from sportstv_streaming_data_warehouse_spark.streaming import quality_gate


def _drop(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _row(i, **over):
    r = {
        "ts": f"2024-03-01T{10 + (i % 10):02d}:00:00",
        "user_id": i,
        "sport": "Biathlon",
        "minutes_streamed": 10,
        "completed": i % 2,
    }
    r.update(over)
    return r


def test_gate_routes_and_loses_nothing(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    rows = [_row(i) for i in range(20)]
    bad_rows = [
        _row(100, user_id=None, sport="bad-null"),
        _row(101, minutes_streamed=-5, sport="bad-neg"),
        _row(102, user_id=None, minutes_streamed=-1, sport="bad-both"),
    ]
    _drop(in_dir, "f1.json", rows + bad_rows)

    exps = [Q.not_null("user_id"), Q.non_negative("minutes_streamed")]
    q1, q2 = quality_gate.start_gated_ingestion(
        spark,
        in_dir,
        exps,
        out_path=str(tmp_path / "fact"),
        dlq_path=str(tmp_path / "dlq"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q1.awaitTermination()
    q2.awaitTermination()

    fact = spark.read.parquet(str(tmp_path / "fact"))
    total_good = fact.agg(F.sum("transaction_count")).first()[0]
    assert total_good == len(rows)  # bad rows never reach the fact

    dlq = spark.read.parquet(str(tmp_path / "dlq")).collect()
    assert len(dlq) == len(bad_rows)
    by_tag = {r["sport"]: set(r["violated_rules"]) for r in dlq}
    assert by_tag["bad-null"] == {"not_null(user_id)"}
    assert by_tag["bad-neg"] == {"non_negative(minutes_streamed)"}
    assert by_tag["bad-both"] == {
        "not_null(user_id)", "non_negative(minutes_streamed)"
    }
