"""Benchmark harness: run every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:

  {"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {"trip_rollup": sec, ...}, "sf": 0.1}

Each query is forced through full execution with the ``noop`` sink
(materializes every row, no collect-to-driver, no disk write) — the
number measures the Spark plan, not pandas conversion.

Each query runs ``$SPARK_GRAFT_BENCH_RUNS`` times (default 3) and
reports the per-query p50, so round-over-round deltas are signal, not
JIT/IO noise; ``queries_min`` carries the best run for reference.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from peskas_mozambique_data_pipeline_spark import registry
from peskas_mozambique_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    # warm the JVM + parquet footers once so per-query numbers measure
    # the plans, not first-touch costs
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        try:
            registry._t(spark, sf_dir, t).count()
        except Exception:
            pass

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    best: dict[str, float] = {}
    for name, fn in registry.SPARK_QUERIES.items():
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)  # p50
        best[name] = round(runs[0], 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_min": best,
                "runs_per_query": n_runs,
                "stat": "p50",
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
