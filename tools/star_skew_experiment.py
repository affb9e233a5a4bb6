"""Star-ETL country-skew experiment — the measured evidence behind the
SCALE.md row for the enrichment join's 100 TB posture under the
reference's REAL key distribution (round-13 verdict task 8).

The reference's published fact is heavily skewed by market: Deutschland
owns 59.9% of all streams (report.Rmd's top-markets table) — a textbook
hot key for any operation that shuffles BY country. The star ETL has
two such candidate spots:

  1. the dim join. The production path broadcasts every dim (they are
     KB-scale: 6 countries, 15K users), so no row ever shuffles by
     country and the hot key is irrelevant — but a naive engine (or a
     dim grown past broadcast size) shuffle-joins fact x dim_country ON
     country_id, landing 59.9% of the fact on ONE task. Variants:
       j5_broadcast   — production: broadcast hash join (J5 shape)
       j5_shuffle+AQE — dim "not broadcastable", AQE skew split on
       j5_shuffle-noAQE — same, skew split off (shuffled-hash feeding a
                          co-partitioned op, stateful streaming, etc.)
       j5_salted      — operators/skew.salted_join (X91), noAQE settings
  2. the fact rollup: groupBy(date_id, country_id, sport). The hot
     country spreads over |dates|x|sports| composite groups AND
     map-side partial aggregation reduces each partition to its local
     group count before the shuffle — the skew never reaches the wire.
     Variants: rollup_plain vs rollup_salted (X91 salted_aggregate).

All variants of a shape must produce IDENTICAL values (asserted).

Corpus: golden-tier-shaped txns (1x = 1,181,863 rows — the reference's
own row count) with user→country resolving to the measured shares
(59.9 / 23.2 / 15.2 / 1.7). Scales via SPARK_GRAFT_STAR_SKEW_SCALES
(default "1,10"; pass "1,10,100" for the 118M-row 100x probe).

Run from the repo root: python tools/star_skew_experiment.py
Writes /tmp/spark_graft_starskew/ (disposable) and prints a table.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from sportstv_streaming_data_warehouse_spark.session import get_spark

DST = "/tmp/spark_graft_starskew"
GOLDEN_ROWS = 1_181_863  # the reference's published source size
N_USERS = 15_000
# measured market shares (report.Rmd top-markets): cumulative bounds on
# a uniform user draw -> user->country assignment produces the same
# stream shares under uniform txns-per-user
SHARES = [(1, 0.599), (2, 0.831), (3, 0.983), (4, 1.0)]
SCALES = list(
    dict.fromkeys(
        int(s.strip())
        for s in os.environ.get("SPARK_GRAFT_STAR_SKEW_SCALES", "1,10").split(",")
        if s.strip()
    )
)
N_REPS = int(os.environ.get("SPARK_GRAFT_STAR_SKEW_REPS", "3"))


def build(spark, label: str, n_rows: int) -> None:
    # user -> country: users are assigned so the uniform txn draw over
    # users yields the measured country shares
    u = F.col("id") / F.lit(float(N_USERS))
    country = F.lit(SHARES[-1][0])
    for cid, bound in reversed(SHARES[:-1]):
        country = F.when(u < bound, F.lit(cid)).otherwise(country)
    user_country = spark.range(N_USERS).select(
        F.col("id").alias("user_id"), country.alias("country_id")
    )
    user_country.write.mode("overwrite").parquet(f"{DST}/user_country.parquet")
    dim_country = spark.createDataFrame(
        [(1, "Deutschland"), (2, "Österreich"), (3, "Schweiz"),
         (4, "Liechtenstein")],
        "country_id long, country string",
    )
    dim_country.write.mode("overwrite").parquet(f"{DST}/dim_country.parquet")

    fact = spark.range(n_rows).select(
        F.col("id").alias("transaction_id"),
        F.pmod(F.xxhash64("id"), F.lit(N_USERS)).alias("user_id"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(365)).alias("date_id"),
        F.element_at(
            F.array(F.lit("Ice Hockey"), F.lit("Ski Jumping"),
                    F.lit("Inline Hockey")),
            (F.pmod(F.xxhash64("id", F.lit(5)), F.lit(3)) + 1).cast("int"),
        ).alias("sport_name"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(120)).alias("minutes"),
    )
    # pre-shuffle across input partitions so the SCAN is not itself
    # skewed — the experiment isolates join/agg shuffle skew
    fact.repartition(64, "transaction_id").write.mode("overwrite").parquet(
        f"{DST}/fact_{label}.parquet"
    )
    # the J5 input: fact already enriched with country_id (via the
    # production broadcast), materialized so every J5 variant times the
    # SAME join input — 59.9% of its rows carry country_id = 1
    f = spark.read.parquet(f"{DST}/fact_{label}.parquet")
    f.join(F.broadcast(user_country), "user_id").repartition(
        64, "transaction_id"
    ).write.mode("overwrite").parquet(f"{DST}/enriched_{label}.parquet")


def _j5(spark, label: str, variant: str):
    f = spark.read.parquet(f"{DST}/enriched_{label}.parquet")
    d = spark.read.parquet(f"{DST}/dim_country.parquet")
    if variant == "j5_broadcast":
        j = f.join(F.broadcast(d), "country_id")
    elif variant == "j5_salted":
        j = salted_join(f, d, on="country_id", salt_from="transaction_id",
                        n_salts=32)
    else:
        j = f.join(d, "country_id")
    # reduce to a tiny verifiable result AFTER the join has paid its
    # full shuffle: per-country rollup of the joined rows
    return j.groupBy("country").agg(
        F.count("*").alias("n"), F.sum("minutes").alias("m")
    )


def _rollup(spark, label: str, variant: str):
    f = spark.read.parquet(f"{DST}/enriched_{label}.parquet")
    if variant == "rollup_salted":
        out = salted_aggregate(
            f, ["date_id", "country_id", "sport_name"], ["minutes"],
            salt_from="transaction_id", n_salts=16,
        ).select(
            "date_id", "country_id", "sport_name",
            F.col("n"), F.col("sum_minutes").alias("m"),
        )
    else:
        out = f.groupBy("date_id", "country_id", "sport_name").agg(
            F.count("*").alias("n"), F.sum("minutes").alias("m")
        )
    # fold to one row per country so the collect is tiny but every
    # group's value feeds the check
    return out.groupBy("country_id").agg(
        F.sum("n").alias("n"), F.sum("m").alias("m"),
        F.count("*").alias("groups"),
    )


def run_variant(spark, label: str, variant: str) -> tuple[float, list]:
    shuffle_variants = {"j5_shuffle+AQE", "j5_shuffle-noAQE", "j5_salted"}
    if variant in shuffle_variants:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.enabled",
        "true" if variant == "j5_shuffle+AQE" else "false",
    )
    try:
        builder = _rollup if variant.startswith("rollup") else _j5
        walls, rows = [], None
        for _ in range(N_REPS + 1):  # first run absorbs codegen
            t0 = time.perf_counter()
            rows = sorted(map(str, builder(spark, label, variant).collect()))
            walls.append(time.perf_counter() - t0)
        return min(walls[1:]), rows
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")


def main() -> None:
    spark = get_spark(app_name="star-skew-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    sizes = {f"{m}x": GOLDEN_ROWS * m for m in SCALES}
    for label, n in sizes.items():
        build(spark, label, n)

    print(
        "star-ETL country skew (Deutschland owns 59.9% of streams; "
        f"golden 1x = {GOLDEN_ROWS:,} rows)"
    )
    header = " ".join(f"{label + ' wall':>12}" for label in sizes)
    print(f"{'variant':>18} {header}")
    for family in (
        ("j5_broadcast", "j5_shuffle+AQE", "j5_shuffle-noAQE", "j5_salted"),
        ("rollup_plain", "rollup_salted"),
    ):
        expected: dict[str, list] = {}
        for variant in family:
            cells = []
            for label in sizes:
                wall, rows = run_variant(spark, label, variant)
                if label not in expected:
                    expected[label] = rows
                assert rows == expected[label], (
                    f"{variant}@{label}: values diverge from "
                    f"{family[0]}"
                )
                cells.append(f"{wall:>11.2f}s")
            print(f"{variant:>18} {' '.join(cells)}")
        print()
    spark.stop()
    shutil.rmtree(DST, ignore_errors=True)


if __name__ == "__main__":
    main()
