"""Compute the next round's MANDATORY correctness-window membership.

The rotation policy (tests/test_catalog_registry.py::
test_no_oracle_query_staler_than_budget_period) requires every oracle-backed
query to either sit in the current 50-slot window or carry a driver-green
row no older than the budget-derived staleness period
(catalog.staleness_period() — 2 rounds while the catalog fits the
50-slot budget's 3-round cycle, growing only as the catalog outgrows
it). This tool folds the recorded
CORRECTNESS_r*.json files (plus an assumed-green current window, since the
driver run for the round in flight lands after the build) and prints:

- the queries that MUST occupy next-round window slots,
- the remaining free-slot budget for debuts,
- ledger entries the DRIVER_GREEN_ROUNDS table is missing (run after a
  new CORRECTNESS file appears; fold with tools/update_ledger.py).

Run from the repo root: python tools/plan_rotation.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sportstv_streaming_data_warehouse_spark.plans.catalog import (  # noqa: E402
    CORRECTNESS_WINDOW,
    DRIVER_GREEN_ROUNDS,
    all_oracles,
    staleness_period,
)
from tools.update_ledger import collect as ledger_collect  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SIZE = 50
ANCHORS = ["flagship_daily_rollup", "star_fact_events"]


def recorded_rounds() -> list[int]:
    import re
    from pathlib import Path

    return sorted(
        int(m.group(1))
        for f in Path(REPO).glob("CORRECTNESS_r*.json")
        if (m := re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f.name))
    )


def greens_from_files() -> dict[str, list[int]]:
    """THE ledger green predicate — tools/update_ledger.collect() — so
    this planner can never disagree with the ledger fold about which
    rows were green (review finding: a duplicated, laxer predicate
    here would inflate last_green and under-plan the rotation)."""
    return ledger_collect()


def main() -> None:
    rounds = recorded_rounds()
    current = max(rounds) + 1 if rounds else 1
    nxt = current + 1
    greens = greens_from_files()

    last_green: dict[str, int] = {}
    pending: set[str] = set()
    for name in all_oracles():
        rs = list(DRIVER_GREEN_ROUNDS.get(name, []))
        rs += greens.get(name, [])
        if name in CORRECTNESS_WINDOW:
            rs.append(current)  # pending this round's driver run
            pending.add(name)
        last_green[name] = max(rs, default=0)

    period = staleness_period()
    mandatory = sorted(
        n
        for n, m in last_green.items()
        if m < nxt - period and n not in ANCHORS
    )
    print(f"recorded rounds: {rounds}; current build round: {current}")
    print(f"next round ({nxt}) window: {WINDOW_SIZE} slots")
    print(f"  anchors ({len(ANCHORS)}): {', '.join(ANCHORS)}")
    print(f"  mandatory rotations ({len(mandatory)}):")
    for n in mandatory:
        print(f"    {n}  (last green r{last_green[n]})")
    # Review finding: window entries are credited r{current} before the
    # driver run exists; if one FAILS its run it must join next round's
    # mandatory list. Surface the at-risk subset so a failed entry is
    # never silently dropped — re-run this tool after CORRECTNESS lands.
    at_risk = sorted(
        n for n in pending
        if n not in ANCHORS
        and max(
            list(DRIVER_GREEN_ROUNDS.get(n, [])) + greens.get(n, []),
            default=0,
        ) < nxt - period
    )
    if at_risk:
        print(
            f"  pending (assumed green r{current}, mandatory r{nxt} if the "
            f"driver run fails — re-plan after CORRECTNESS_r{current:02d} "
            f"lands) ({len(at_risk)}):"
        )
        for n in at_risk:
            print(f"    {n}")
    free = WINDOW_SIZE - len(ANCHORS) - len(mandatory)
    print(f"  free slots for debuts/re-verification: {free}")
    if free < 0:
        print("  !! OVER BUDGET — stagger the rotations across two rounds")

    missing = [
        n
        for n, rs in greens.items()
        if sorted(set(DRIVER_GREEN_ROUNDS.get(n, []))) != sorted(set(rs))
    ]
    if missing:
        print(f"ledger out of date for {len(missing)} entries — run the "
              "update_ledger fold")


if __name__ == "__main__":
    main()
