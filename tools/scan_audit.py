"""Plan-level scan audit: for every registry query, count how many
times each parquet table (and any checkpointed RDD) appears in the
physical plan.  A table appearing N times means the plan reads it N
times — either deliberately (self-joins: dedup pair generation,
model-then-score) or accidentally (an aggregate feeding multiple
consumers without a localCheckpoint cut, the r10 embedding_drift /
domain_mixture_weights finding).  Run after adding an operator; any
count that jumps unexpectedly is a re-compute bug before it is a
benchmark regression.

Usage: python tools/scan_audit.py [--sf-dir DIR] [--max N] [query ...]
Prints queries whose max per-table scan count exceeds N (default 2 —
self-joins are legitimate; 3+ usually means a missing cut).
Exit 0 always (informational; thresholds move with design intent).
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from peskas_mozambique_data_pipeline_spark import registry
from peskas_mozambique_data_pipeline_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def scan_counts(df) -> dict[str, int]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    out = {t: plan.count(f"{t}.parquet") for t in TABLES}
    out["<checkpoint-rdd>"] = plan.count("Scan ExistingRDD")
    return {k: v for k, v in out.items() if v}


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
    argv = sys.argv[1:]
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    max_ok = 2
    if "--max" in argv:
        i = argv.index("--max")
        max_ok = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    names = argv or list(registry.SPARK_QUERIES)

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    flagged = 0
    print(f"{'query':22} {'max':>4}  per-table scan counts")
    for name in names:
        fn = registry.SPARK_QUERIES.get(name) or registry.RETIRED_QUERIES[name]
        try:
            counts = scan_counts(fn(spark, sf_dir))
        except Exception as e:  # explain itself failed
            print(f"{name:22} ERR  {type(e).__name__}: {e}")
            continue
        parquet_max = max(
            (v for k, v in counts.items() if k != "<checkpoint-rdd>"),
            default=0,
        )
        if parquet_max > max_ok:
            flagged += 1
            print(f"{name:22} {parquet_max:>4}  {counts}  <-- review")
        elif "-v" in sys.argv:
            print(f"{name:22} {parquet_max:>4}  {counts}")
    print(f"\n{flagged} queries exceed {max_ok} scans of one parquet table")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
