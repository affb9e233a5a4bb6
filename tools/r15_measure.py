"""Round-15 optimization measurement harness.

Captures `.explain("formatted")` for headline queries into
plans/r15/<name>_<tag>.txt and times each with the bench's own
hash-force probe (same methodology as bench.py: discarded warm-up, N
timed iterations, min3-median). Usage:

    python tools/r15_measure.py before                # all headline queries
    python tools/r15_measure.py after q1 q2 ...       # a subset, tagged 'after'
    SPARK_GRAFT_R14_ITERS=3 python tools/r15_measure.py before

Prints one JSON line {"tag": ..., "queries": {name: sec}} plus per-query
plan-shape stats (Exchange count, join strategies, BatchEvalPython) to
stderr so plan diffs are quick to eyeball.
"""

import json
import os
import re
import statistics
import sys
import time
from contextlib import redirect_stdout
import io

sys.path.insert(0, ".")

from sportstv_streaming_data_warehouse_spark.plans.catalog import QUERIES  # noqa: E402
from sportstv_streaming_data_warehouse_spark.session import get_spark  # noqa: E402


def headline() -> list[str]:
    import bench

    return list(bench.HEADLINE)


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_shape(text: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", text))
        - len(re.findall(r"ReusedExchange", text)),
        "reused_exchanges": len(re.findall(r"ReusedExchange", text)),
        "smj": len(re.findall(r"SortMergeJoin", text)),
        "bhj": len(re.findall(r"BroadcastHashJoin", text)),
        "shj": len(re.findall(r"ShuffledHashJoin", text)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", text)),
        "cartesian": len(re.findall(r"CartesianProduct", text)),
        "python": len(re.findall(r"(Batch|Arrow)EvalPython|MapInPandas|MapInArrow", text)),
        "scans": len(re.findall(r"Scan parquet", text)),
        "sorts": len(re.findall(r"\bSort \[", text)),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or headline()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = int(os.environ.get("SPARK_GRAFT_R14_ITERS", "3"))
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark(app_name="r15-measure")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    # same warmup as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run_full(name: str) -> None:
        df = QUERIES[name](spark, sf_dir)
        df.select(
            F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("h")
        ).collect()

    results: dict[str, float] = {}
    shapes: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r15:{tag}:{name}")
        df = QUERIES[name](spark, sf_dir)
        text = plan_text(df)
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(text)
        shapes[name] = plan_shape(text)
        run_full(name)  # warm-up, discarded
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            run_full(name)
            times.append(time.perf_counter() - t0)
        results[name] = round(statistics.median(sorted(times)[:3]), 3)
        print(
            json.dumps({"q": name, "sec": results[name], "shape": shapes[name]}),
            file=sys.stderr,
            flush=True,
        )
    print(json.dumps({"tag": tag, "total": round(sum(results.values()), 3), "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
