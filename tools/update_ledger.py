"""Regenerate DRIVER_GREEN_ROUNDS in plans/catalog.py from the
CORRECTNESS_r{N}.json files in the repo root.

Run from the repo root at the START of a round, after the driver has
written the previous round's CORRECTNESS file:

    python tools/update_ledger.py        # rewrite the dict in place
    python tools/update_ledger.py --check  # exit 1 if out of date

The ledger is the machine-checkable record of which query earned a full
driver pass (rows + schema + hash, no error) in which round;
tests/test_catalog_registry.py asserts it matches the files exactly, so
this tool and that test together keep the ledger honest.
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
CATALOG = REPO / "sportstv_streaming_data_warehouse_spark" / "plans" / "catalog.py"
HEAD = "DRIVER_GREEN_ROUNDS: dict[str, list[int]] = {"
TAIL = "}"


def collect() -> dict[str, list[int]]:
    truth: dict[str, list[int]] = {}
    import re as _re

    rounds = sorted(
        int(m.group(1))
        for f in REPO.glob("CORRECTNESS_r*.json")
        if (m := _re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f.name))
    )
    for rnd in rounds:
        path = REPO / f"CORRECTNESS_r{rnd:02d}.json"
        if not path.exists():  # unpadded names: re-glob exact file
            path = next(
                f for f in REPO.glob("CORRECTNESS_r*.json")
                if _re.fullmatch(rf"CORRECTNESS_r0*{rnd}\.json", f.name)
            )
        for name, row in json.loads(path.read_text()).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                truth.setdefault(name, []).append(rnd)
    return truth


def render(truth: dict[str, list[int]]) -> str:
    # preserve the catalog's existing ordering where possible: first the
    # current file's order, then new names in first-green order
    current = CATALOG.read_text()
    m = re.search(re.escape(HEAD) + r"\n(.*?)\n\}", current, re.S)
    existing_order = re.findall(r'^\s+"([^"]+)":', m.group(1), re.M) if m else []
    ordered = [n for n in existing_order if n in truth]
    ordered += [n for n in sorted(truth, key=lambda k: (truth[k][0], k)) if n not in ordered]
    lines = [f'    "{n}": {truth[n]},' for n in ordered]
    return HEAD + "\n" + "\n".join(lines) + "\n" + TAIL


def main() -> None:
    truth = collect()
    src = CATALOG.read_text()
    m = re.search(re.escape(HEAD) + r"\n.*?\n\}", src, re.S)
    if not m:
        print("DRIVER_GREEN_ROUNDS block not found in catalog.py")
        sys.exit(2)
    new_block = render(truth)
    up_to_date = m.group(0) == new_block
    if "--check" in sys.argv:
        print("ledger up to date" if up_to_date else "ledger OUT OF DATE")
        sys.exit(0 if up_to_date else 1)
    if up_to_date:
        print("ledger already up to date")
        return
    CATALOG.write_text(src[: m.start()] + new_block + src[m.end():])
    rounds = sorted({r for v in truth.values() for r in v})
    print(
        f"ledger rewritten: {len(truth)} queries across rounds {rounds}; "
        "re-run tests/test_catalog_registry.py"
    )


if __name__ == "__main__":
    main()
