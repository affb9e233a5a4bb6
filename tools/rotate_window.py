"""Rewrite CORRECTNESS_WINDOW in plans/catalog.py for the next round.

The manual rotation ritual (fold the ledger, read plan_rotation's
mandatory list, hand-edit the window, re-run the registry tests) is now
one command to run at the START of a round, after the driver has written
the previous round's CORRECTNESS file:

    python tools/update_ledger.py      # fold the new CORRECTNESS file
    python tools/rotate_window.py      # rewrite the window list
    python tools/rotate_window.py --dry-run   # print, don't write

Window policy (the same one every manual rotation followed):
  1. the two ANCHORS stay, always;
  2. every oracle whose last driver-green row is older than
     current_round - staleness_period() is MANDATORY (the staleness
     gate in tests/test_catalog_registry.py fires otherwise; the
     period is the signed-off budget-derived bar from catalog.py —
     round 7 aligned this tool with it, the hard-coded 2 would have
     declared a false OVER BUDGET once the r5 cohort came due);
  3. remaining free slots pre-pay the NEXT round's debt: oldest
     last-green first, name-ordered within a round cohort.
New debuts are NOT scheduled here — a debut displaces the newest
free-slot pick by hand (it has no ledger row yet, so the policy cannot
see it; the registry tests catch a window without it).

The rewrite replaces only the list literal; the curated rotation-history
comment block above it is preserved. Run the registry tests afterwards:
    python -m pytest tests/test_catalog_registry.py -q
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sportstv_streaming_data_warehouse_spark.plans.catalog import (  # noqa: E402
    DRIVER_GREEN_ROUNDS,
    all_oracles,
    staleness_period,
)
from tools.plan_rotation import ANCHORS, WINDOW_SIZE, recorded_rounds  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CATALOG = os.path.join(
    REPO, "sportstv_streaming_data_warehouse_spark", "plans", "catalog.py"
)


def plan_window() -> tuple[list[str], int, dict[str, int]]:
    rounds = recorded_rounds()
    current = max(rounds) + 1 if rounds else 1
    # Plan from the CORRECTNESS artifacts directly — they are the source
    # of truth; the committed DRIVER_GREEN_ROUNDS table is only a
    # snapshot of them.  The driver writes CORRECTNESS_r{N}.json AFTER
    # the builder's last round-N commit, so at every end-of-round HEAD
    # the snapshot lags one artifact; the round-12/13 verdicts flagged
    # the old SystemExit here as self-inflicted (the artifact is sitting
    # in the tree — refusing to read it made the tool unusable exactly
    # when it is needed).  Warn so the builder still folds, but plan
    # from the real data either way.
    from tools.update_ledger import collect as ledger_collect

    recorded_greens = ledger_collect()
    out_of_date = [
        n
        for n, rs in recorded_greens.items()
        if sorted(set(DRIVER_GREEN_ROUNDS.get(n, []))) != sorted(set(rs))
    ]
    if out_of_date:
        print(
            f"NOTE: committed ledger lags the artifacts for {len(out_of_date)} "
            "queries — planning from CORRECTNESS_r*.json directly; run "
            "tools/update_ledger.py to fold",
            file=sys.stderr,
        )
    # debuts (no ledger row yet) are NOT schedulable by this policy —
    # they must displace a pre-pay pick by hand, per the docstring; with
    # last=0 they would otherwise masquerade as mandatory rotations
    debuts = sorted(n for n in all_oracles() if n not in recorded_greens)
    if debuts:
        print(
            "WARNING: oracle-backed queries with no ledger row (debuts?): "
            + ", ".join(debuts)
            + " — excluded from this plan; slot them by hand",
            file=sys.stderr,
        )
    last = {
        n: max(recorded_greens[n])
        for n in all_oracles()
        if n in recorded_greens
    }
    period = staleness_period()
    mandatory = sorted(
        n for n, m in last.items() if m < current - period and n not in ANCHORS
    )
    free = WINDOW_SIZE - len(ANCHORS) - len(mandatory)
    if free < 0:
        raise SystemExit(
            f"OVER BUDGET: {len(mandatory)} mandatory rotations exceed "
            f"{WINDOW_SIZE - len(ANCHORS)} slots — stagger by hand"
        )
    prepay = sorted(
        (n for n, m in last.items() if n not in ANCHORS and n not in mandatory),
        key=lambda n: (last[n], n),
    )[:free]
    return list(ANCHORS) + mandatory + prepay, current, last


def render(window: list[str], current: int, last: dict[str, int]) -> str:
    lines = [
        "CORRECTNESS_WINDOW = [",
        "    # anchors (kept green every round for regression detection)",
    ]
    lines += [f'    "{n}",' for n in ANCHORS]
    lines.append(
        f"    # round-{current} mandatory rotations "
        f"(last green < r{current - staleness_period()}) — tools/rotate_window.py"
    )
    body = window[len(ANCHORS):]
    n_mand = sum(1 for n in body if last[n] < current - staleness_period())
    lines += [f'    "{n}",' for n in body[:n_mand]]
    lines.append(
        f"    # round-{current + 1} pre-pay (oldest last-green first); "
        "debuts displace from the bottom"
    )
    lines += [f'    "{n}",' for n in body[n_mand:]]
    lines.append("]")
    return "\n".join(lines)


def main() -> None:
    window, current, last = plan_window()
    block = render(window, current, last)
    src = open(CATALOG).read()
    m = re.search(r"CORRECTNESS_WINDOW = \[\n.*?\n\]", src, re.S)
    if not m:
        raise SystemExit("CORRECTNESS_WINDOW block not found")
    if "--dry-run" in sys.argv:
        print(block)
        return
    open(CATALOG, "w").write(src[: m.start()] + block + src[m.end():])
    print(
        f"window rewritten for round {current}: {len(window)} slots "
        f"({sum(1 for n in window if n not in ANCHORS and last[n] < current - staleness_period())}"
        f" mandatory). Run: python -m pytest tests/test_catalog_registry.py -q"
    )


if __name__ == "__main__":
    main()
