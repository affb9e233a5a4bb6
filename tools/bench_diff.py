"""Compare the two most recent BENCH_history.jsonl entries at the same
scale factor: per-query median ratios, flagged beyond a noise band.

Run from the repo root: python tools/bench_diff.py [--band 2.0]
Shared-box guidance: judge ratios against the band, not to 1.0 — the
recorded loadavg of each entry is printed so a contaminated window is
visible (±30% is normal; >2x on one query with quiet loadavg on both
sides is a real regression candidate).
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    band = 2.0
    if "--band" in sys.argv:
        band = float(sys.argv[sys.argv.index("--band") + 1])
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_history.jsonl")
    entries = [json.loads(line) for line in open(path) if line.strip()]
    by_sf: dict[object, list[dict]] = {}
    for e in entries:
        by_sf.setdefault(e.get("sf"), []).append(e)
    sf, runs = max(by_sf.items(), key=lambda kv: len(kv[1]))
    if len(runs) < 2:
        print("need two runs at one sf to diff")
        return
    prev, cur = runs[-2], runs[-1]
    print(f"sf={sf}  prev git={prev.get('git')} loadavg={prev.get('loadavg')}  "
          f"cur git={cur.get('git')} loadavg={cur.get('loadavg')}")
    print(f"{'query':28} {'prev':>7} {'cur':>7} {'ratio':>6}")
    flagged = []
    for name, t in cur["queries"].items():
        p = prev["queries"].get(name)
        if p is None:
            print(f"{name:28} {'new':>7} {t:7.2f}")
            continue
        r = t / p if p else float("inf")
        mark = " <-- beyond band" if r > band or r < 1 / band else ""
        if mark:
            flagged.append(name)
        print(f"{name:28} {p:7.2f} {t:7.2f} {r:5.1f}x{mark}")
    print(f"total: prev {prev['value']} -> cur {cur['value']}; "
          f"{len(flagged)} beyond {band}x band: {flagged}")


if __name__ == "__main__":
    main()
