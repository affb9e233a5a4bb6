"""Round-14 config A/B: run a query subset under baseline vs candidate
session confs in alternating subprocesses (same interleaving rationale
as tools/ab_compare.py — box drift decorrelates from the config delta).

Usage: python tools/r14_conf_ab.py '<json-conf>' q1,q2,... [rounds]
Child mode (internal): R14_CONF_CHILD=1 with conf/queries via argv.
"""

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def child(conf_json: str, names: list[str]) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from sportstv_streaming_data_warehouse_spark.plans.catalog import QUERIES
    from sportstv_streaming_data_warehouse_spark.session import get_spark

    spark = get_spark(app_name="conf-ab", extra_conf=json.loads(conf_json))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # warmup derives from the same env var as the timed runs (r14 ADVICE:
    # a hardcoded /root/testdata path broke the harness on other boxes)
    QUERIES["flagship_daily_rollup"](spark, sf).count()

    def run_full(name: str) -> None:
        df = QUERIES[name](spark, sf)
        df.select(F.bit_xor(F.xxhash64(F.struct(*df.columns)))).collect()

    out = {}
    for name in names:
        run_full(name)  # warm
        best = min(
            _t(run_full, name) for _ in range(2)
        )
        out[name] = round(best, 3)
    print(json.dumps({"total": round(sum(out.values()), 3), "queries": out}))
    spark.stop()


def _t(fn, *a):
    t0 = time.perf_counter()
    fn(*a)
    return time.perf_counter() - t0


def main() -> None:
    if os.environ.get("R14_CONF_CHILD"):
        child(sys.argv[1], sys.argv[2].split(","))
        return
    conf = sys.argv[1]
    queries = sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sides = {"base": "{}", "cand": conf}
    results = {k: [] for k in sides}
    per_q = {k: {} for k in sides}
    for i in range(rounds):
        for k, c in sides.items():
            env = dict(os.environ, R14_CONF_CHILD="1")
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), c, queries],
                capture_output=True, text=True, env=env, timeout=3600,
            )
            if p.returncode != 0:
                raise SystemExit(f"{k} failed:\n{p.stderr[-2000:]}")
            rec = json.loads(p.stdout.strip().splitlines()[-1])
            results[k].append(rec["total"])
            for q, v in rec["queries"].items():
                per_q[k].setdefault(q, []).append(v)
            print(f"pair {i+1} {k}: {rec['total']}", flush=True)
    print("medians:", {k: round(statistics.median(v), 3) for k, v in results.items()})
    for q in per_q["base"]:
        b = statistics.median(per_q["base"][q])
        c = statistics.median(per_q["cand"][q])
        print(f"  {q}: base {b:.2f}s cand {c:.2f}s ratio {b/c:.2f}")


if __name__ == "__main__":
    main()
