"""Scale experiment: replicate the sf0.1 fixtures 10x into /tmp and
re-run the headline operators, including the dedup family with its
scale guards ACTIVE — the measured evidence behind SCALE.md's
sub-linearity claims beyond 600K rows.

Run from the repo root: python tools/scale_experiment.py
Writes /tmp/spark_graft_scale10/ (disposable) and prints a table.

Replication semantics (per table):
- lineitem/orders: key-offset replicas (same value distribution, disjoint
  keys) — aggregation/join workloads grow 10x in rows, not in key space
  where the key is a grain (dates/flags stay fixed).
- documents: doc_id-offset replicas with IDENTICAL text — every document
  gains 9 exact duplicates, which is precisely the workload exact/fuzzy
  dedup exists for.
- embeddings: vec_id-offset replicas with deterministic per-element
  noise (~cos 0.97 to the original) — near-duplicate families for the
  banded semantic dedup, not degenerate identical vectors.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans.catalog import QUERIES
from sportstv_streaming_data_warehouse_spark.session import get_spark
from sportstv_streaming_data_warehouse_spark.sources.fixtures import (
    FIXTURE_TABLES,
    load_table,
)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/spark_graft_scale10"
REPLICAS = 10

# Fuzzy-TEXT dedup (minhash / token-Jaccard) is deliberately absent: the
# synthetic corpus draws from a ~31-token vocabulary, so at 10x nearly
# every document pair is a legitimate near-dup candidate and the
# measurement reflects the fixture's degeneracy, not the operator (the
# documented pipeline also runs exact_dedup FIRST, which collapses the
# replicas straight back to 1x). Their scale guards are exercised by
# tests/test_token_cap.py instead.
QUERY_SET = [
    "flagship_daily_rollup",
    "star_fact_events",
    "a_rollup_hierarchy",
    "w_sessionize",
    "x_dedup_exact",
    "x_dedup_embedding_cosine",
    "x_quality_deciles",
    "x_text_profile",
]


def build(spark) -> None:
    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    for t in FIXTURE_TABLES:
        df = load_table(spark, SRC, t)
        if t in ("lineitem", "orders", "events", "documents", "embeddings"):
            keyed = {
                "lineitem": "l_orderkey",
                "orders": "o_orderkey",
                "events": "event_id",
                "documents": "doc_id",
                "embeddings": "vec_id",
            }[t]
            span = df.agg(F.max(keyed)).first()[0] + 1
            parts = []
            for r in range(REPLICAS):
                rep = df.withColumn(keyed, F.col(keyed) + F.lit(r * span))
                if t == "embeddings" and r > 0:
                    # deterministic directional noise per (vec, element):
                    # amplitude ~0.04 vs component std ~0.125 → cos≈0.97
                    rep = rep.withColumn(
                        "embedding",
                        F.transform(
                            "embedding",
                            lambda x, d: x.cast("double")
                            + (
                                F.pmod(
                                    (F.col("vec_id") * 64 + d.cast("long"))
                                    * 2654435761,
                                    F.lit(1000),
                                ).cast("double")
                                / 1000.0
                                - 0.5
                            )
                            * 0.08,
                        ),
                    )
                parts.append(rep)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = df  # dims stay fixed — realistic: dimensions don't 10x
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")


def time_query(spark, name: str, sf_dir: str) -> tuple[float, int]:
    def run():
        return QUERIES[name](spark, sf_dir)

    run().count()  # warm (plan + IO cache)
    t0 = time.perf_counter()
    n = run().count()
    return time.perf_counter() - t0, n


def main() -> None:
    spark = get_spark(app_name="scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"building {REPLICAS}x replica of {SRC} at {DST} ...")
    t0 = time.perf_counter()
    build(spark)
    print(f"built in {time.perf_counter() - t0:.0f}s")

    print(f"{'query':36} {'1x wall':>8} {'10x wall':>9} {'ratio':>6}  rows(10x)")
    for name in QUERY_SET:
        w1, _ = time_query(spark, name, SRC)
        w10, n10 = time_query(spark, name, DST)
        print(f"{name:36} {w1:7.2f}s {w10:8.2f}s {w10 / w1:5.1f}x  {n10}")
    spark.stop()


if __name__ == "__main__":
    main()
