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


if __name__ == "__main__":
    main()
