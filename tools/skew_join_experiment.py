"""Hot-key JOIN skew experiment — the measured evidence behind the
SCALE.md row for x_salted_skew_join / operators/skew.salted_join.

Scenario (the one salted_join exists for): the enrichment dim is too
big to broadcast (at 100 TB a user dim does not fit an executor — the
j2 docstring's adjudication), and one user owns a large share of the
fact. A plain shuffle join then lands the entire hot key on ONE task;
the stage wall is that straggler. AQE's skew-join splitter covers the
sort-merge path when it is allowed to kick in, so the experiment
reports THREE walls per scale, not a strawman two:

  plain+AQE   — shuffle join, AQE skew split enabled (the default)
  plain-noAQE — shuffle join, skew split disabled (what a salted join
                replaces when AQE cannot re-plan: shuffled-hash joins
                feeding a co-partitioned downstream op, stateful
                streaming joins, engines without runtime re-planning)
  salted      — operators/skew.salted_join, same settings as noAQE

All three must produce IDENTICAL aggregated values (asserted).

Corpus: events-shaped rows where user 42 owns HOT_SHARE of the fact and
the rest follow the fixture's uniform users; dim = 15K users with a
country. 1x = 600K rows (sf0.1-sized), 10x = 6M.

Run from the repo root: python tools/skew_join_experiment.py
Writes /tmp/spark_graft_skewjoin/ (disposable) and prints a table.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.operators.skew import salted_join
from sportstv_streaming_data_warehouse_spark.session import get_spark

DST = "/tmp/spark_graft_skewjoin"
N_USERS = 15_000
HOT_USER = 42
HOT_SHARE = 0.4
BASE_ROWS = 600_000
# comma-separated replica multipliers, e.g. "1,10,100" for the 100x probe
# (whitespace/empty segments tolerated; duplicates dropped, order kept)
SCALES = list(
    dict.fromkeys(
        int(s.strip())
        for s in os.environ.get("SPARK_GRAFT_SKEW_SCALES", "1,10").split(",")
        if s.strip()
    )
)


def build(spark, label: str, n_rows: int) -> None:
    n_hot = int(n_rows * HOT_SHARE)
    fact = spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") < n_hot, F.lit(HOT_USER))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_USERS)))
        .alias("user_id"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10_000)).cast("double") / 100.0).alias(
            "value"
        ),
    )
    # pre-shuffle the hot block across input partitions so the SCAN is
    # not itself skewed — the experiment isolates JOIN-shuffle skew
    fact.repartition(64, "event_id").write.mode("overwrite").parquet(
        f"{DST}/fact_{label}.parquet"
    )
    dim = spark.range(N_USERS).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("country_"), F.pmod("id", F.lit(25)).cast("string")).alias(
            "country"
        ),
    )
    dim.write.mode("overwrite").parquet(f"{DST}/dim_{label}.parquet")


def rollup(joined):
    return joined.groupBy("country").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
    )


def run_variant(spark, label: str, variant: str) -> tuple[float, list]:
    # the dim is "too big to broadcast" by scenario: force shuffle joins
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.enabled",
        "true" if variant == "plain+AQE" else "false",
    )
    try:
        def build_out():
            # fresh reads + fresh lineage per run: Spark reuses shuffle
            # files for identical RDD objects (map stages show as
            # "skipped"), which would time only the final reduce stage
            f = spark.read.parquet(f"{DST}/fact_{label}.parquet")
            d = spark.read.parquet(f"{DST}/dim_{label}.parquet")
            if variant == "salted":
                j = salted_join(f, d, on="user_id", salt_from="event_id", n_salts=16)
            else:
                j = f.join(d, "user_id")
            return rollup(j)

        walls = []
        rows = None
        for _ in range(4):  # first run absorbs codegen; min-of-3 after
            t0 = time.perf_counter()
            rows = sorted(
                map(str, ((r["country"], r["n"], r["s"]) for r in build_out().collect()))
            )
            walls.append(time.perf_counter() - t0)
        return min(walls[1:]), rows
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")


def main() -> None:
    spark = get_spark(app_name="skew-join-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    sizes = {f"{m}x": BASE_ROWS * m for m in SCALES}
    for label, n in sizes.items():
        build(spark, label, n)

    print(
        f"hot-key join (user {HOT_USER} owns {HOT_SHARE:.0%}, dim not broadcastable)"
    )
    header = " ".join(f"{label + ' wall':>10}" for label in sizes)
    print(f"{'variant':14} {header} {'last/first':>10}")
    walls: dict[tuple[str, str], float] = {}
    values: dict[tuple[str, str], list] = {}
    labels = list(sizes)
    for variant in ("plain+AQE", "plain-noAQE", "salted"):
        for label in labels:
            walls[(variant, label)], values[(variant, label)] = run_variant(
                spark, label, variant
            )
        row = " ".join(f"{walls[(variant, l)]:9.2f}s" for l in labels)
        ratio = walls[(variant, labels[-1])] / walls[(variant, labels[0])]
        print(f"{variant:14} {row} {ratio:9.1f}x")
    for label in labels:
        assert (
            values[("plain+AQE", label)]
            == values[("plain-noAQE", label)]
            == values[("salted", label)]
        ), f"variant outputs diverge at {label}"
    print("all variants value-identical at all scales")
    spark.stop()


if __name__ == "__main__":
    main()
