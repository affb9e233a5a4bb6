"""One A/B measurement run against a specific checkout of this repo.

Usage:  python tools/ab_worker.py --repo /path/to/checkout [--sf-dir DIR]
                                  [--iters 2] [--golden 1]

Spawned by tools/ab_compare.py in ALTERNATION between two checkouts —
the controlled same-box methodology used for the round-12 compaction
exoneration (SCALE.md): interleaving controls for box drift, because a
code regression follows the checkout while box inflation follows the
wall clock. The worker process imports the TARGET checkout's modules
(sys.path pinned before any engine import), times the frozen round-6
51-query headline prefix with bench.py's own hash-force probe, runs the
golden-tier ETL once, measures the box probes, and prints ONE JSON line.

Per-query statistic here is MIN of the timed iterations (not
min3-median): each worker run is one sample in a cross-run comparison,
and min is the statistic least sensitive to within-run interference —
the cross-run spread is what ab_compare reads.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# the frozen round-6 headline prefix — both sides of any A/B this tool
# will ever run carry these 51 queries (the set was frozen from round 6
# through round 12; round 13+ additions are deliberately excluded so the
# comparison stays same-set)
R6_QUERIES = [
    "flagship_daily_rollup", "star_fact_events", "j5_fact_by_country",
    "a4_global_summary", "w2_peak_dow_per_flag", "w3_yoy_order_growth",
    "r1_pivot_year_matrix", "w_sessionize", "a_rollup_hierarchy",
    "f_json_extract", "x_asof_join_last_signup", "x_range_join_value_bands",
    "x_dedup_exact", "x_dedup_minhash_lsh", "x_knn_bruteforce",
    "x_text_stats", "x_dedup_embedding_cosine", "x_quality_deciles",
    "x_doc_chunking", "x_embedding_quantize", "x_tfidf_top_terms",
    "x_dedup_survivors", "x_bm25_topk", "x_global_shuffle",
    "x_quality_filter_by_lang", "x_kmeans_lloyd", "x_scd2_point_in_time",
    "x_dedup_incremental", "x_passage_dedup", "x_token_entropy",
    "a_cohort_retention", "w_event_transitions", "a_pareto_abc",
    "x_copurchase_pairs", "w_rolling_distinct_7d", "x_unigram_surprisal",
    "x_hard_negatives", "x_session_features", "w_active_streaks",
    "w_daily_ohlc", "w_forward_fill", "x_bigram_surprisal",
    "x_weighted_sample", "x_anomaly_zscore", "x_sample_exact_k",
    "x_salted_skew_join", "x_heavy_hitters", "h_sketch_rollup_hll",
    "w_event_sequences", "q_out_of_order_audit", "x_cascade_delete_plan",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--golden", type=int, default=1)
    ap.add_argument(
        "--queries", default=None,
        help="comma-separated query subset (default: the frozen R6 set)",
    )
    args = ap.parse_args()

    repo = os.path.abspath(args.repo)
    # the target checkout's modules, and ONLY then the engine imports;
    # cwd moves too so metastore_db/derby.log land inside the checkout
    sys.path.insert(0, repo)
    os.chdir(repo)
    import subprocess

    git = subprocess.run(
        ["git", "-C", repo, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, timeout=10,
    ).stdout.strip()

    import bench  # the TARGET's bench module (golden tier = code under test)
    from pyspark.sql import functions as F
    from sportstv_streaming_data_warehouse_spark.plans.catalog import QUERIES
    from sportstv_streaming_data_warehouse_spark.session import get_spark

    # The box probes live HERE, not in the target's bench module: the
    # target may predate a probe (9a82b1c predates ref/mt), and the A/B
    # needs the IDENTICAL probe code on both sides. These are verbatim
    # twins of bench.py's frozen probes.
    def cpu_probe() -> float:
        t0 = time.perf_counter()
        acc = 0
        for i in range(5_000_000):
            acc += i ^ (i >> 3)
        assert acc != 0
        return round(time.perf_counter() - t0, 3)

    def ref_probe() -> float:
        def once() -> float:
            t0 = time.perf_counter()
            (
                spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")
                .groupBy("l_returnflag")
                .agg(F.sum("l_quantity"), F.count("*"))
                .collect()
            )
            return time.perf_counter() - t0

        once()
        return round(min(once() for _ in range(3)), 3)

    def mt_probe() -> float:
        def once() -> float:
            t0 = time.perf_counter()
            spark.range(0, 1_024_000_000, 1, 32).selectExpr(
                "sum(id * 3 + 1)"
            ).collect()
            return time.perf_counter() - t0

        once()
        return round(min(once() for _ in range(3)), 3)

    spark = get_spark(app_name=f"ab-{git}")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup discipline as bench.main
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    QUERIES["flagship_daily_rollup"](spark, "/root/testdata/sf0.001").count()
    QUERIES["x_dedup_minhash_lsh"](spark, "/root/testdata/sf0.001").count()

    def run_full(name: str) -> None:
        df = QUERIES[name](spark, args.sf_dir)
        df.select(
            F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("h")
        ).collect()

    names = (
        [n for n in args.queries.split(",") if n] if args.queries else R6_QUERIES
    )
    cpu0 = cpu_probe()
    queries: dict[str, float] = {}
    for name in names:
        run_full(name)  # warm
        best = min(
            _timed(run_full, name) for _ in range(max(args.iters, 1))
        )
        queries[name] = round(best, 3)
    total = round(sum(queries.values()), 3)

    golden = None
    if args.golden:
        try:
            golden = bench.run_golden_tier(spark)
        except Exception as exc:
            golden = {"error": f"{type(exc).__name__}: {exc}"[:200]}

    # box probes AFTER the sweep, bench.main placement
    spark.range(1).count()
    ej = []
    for _ in range(5):
        t0 = time.perf_counter()
        spark.range(1).count()
        ej.append(time.perf_counter() - t0)
    ej.sort()
    record = {
        "git": git,
        "repo": repo,
        "total_min": total,
        "queries": queries,
        "golden_tier": golden,
        "empty_job_ms": round(ej[len(ej) // 2] * 1000, 1),
        "cpu_speed_probe_start": cpu0,
        "cpu_speed_probe_end": cpu_probe(),
        "ref_query_probe": ref_probe(),
        "mt_speed_probe": mt_probe(),
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "wall_clock": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    spark.stop()
    print(json.dumps(record))


def _timed(fn, *a) -> float:
    t0 = time.perf_counter()
    fn(*a)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
