"""Verification-window rotation helper: for every registered query,
report the last round with a hard driver-green row (from the
CORRECTNESS_r*.json artifacts) and whether it sits inside the current
50-query window.  Use this when resizing _VERIFY_FIRST/_VERIFY_LAST so
no query goes more than ~2 rounds without a driver row.

Usage: python tools/rotation_status.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from peskas_mozambique_data_pipeline_spark import registry


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        data = json.load(open(path))
        for name, row in data.items():
            ok = (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            if ok:
                last_green[name] = max(last_green.get(name, -1), rnd)

    names = list(registry.SPARK_QUERIES)
    window = set(names[:50])
    print(f"{'query':26s} {'last driver-green':>18s} {'in r-next window':>17s}")
    stale = []
    for n in names:
        lg = last_green.get(n)
        inw = n in window
        print(f"{n:26s} {str(lg) if lg is not None else 'never':>18s} {str(inw):>17s}")
        if not inw and lg is None:
            stale.append(n)
    if stale:
        print(f"\nWARNING: outside window AND never driver-green: {stale}")
    else:
        print("\nOK: every query outside the window has a driver-green round.")

    # Registry-size policy (VERDICT r5 #7): with a 50-row driver window
    # a 2-round rotation cadence can cover at most 100 queries.  The
    # policy is CONSOLIDATE before crossing 100 — overlapping queries
    # (shared scaffolding, same operator family) merge rather than the
    # cadence stretching to 3 rounds.  registry.MAX_REGISTERED_QUERIES
    # enforces the ceiling at import time; this reports the headroom.
    total = len(names)
    cap = registry.MAX_REGISTERED_QUERIES
    print(
        f"registry: {total}/{cap} queries "
        f"({cap - total} additions left before consolidation is required; "
        f"2-round cadence holds while total <= {cap})"
    )
    # staleness audit: with the 2-round cadence, nothing in the tail
    # may be >1 round behind the newest artifact
    if last_green:
        newest = max(last_green.values())
        lagging = [
            n for n in names[50:]
            if last_green.get(n, -1) < newest - 1
        ]
        if lagging:
            print(f"WARNING: tail queries >1 round stale: {lagging}")
        else:
            print("OK: no tail query is more than 1 round stale.")


if __name__ == "__main__":
    main()
