"""ANN recall-vs-latency sweep: the knob table behind the two ANN tiers.

Runs the IVF tier across ``n_probe`` and the LSH tier across
``n_tables`` at $SPARK_GRAFT_SF_DIR, measuring per-config wall time and
recall@k against the brute-force cosine baseline (ground truth).  This
is the artifact an operator uses to pick a config: recall climbs with
n_probe / n_tables, latency climbs with candidate volume — the sweep
shows where the curve bends.

Usage: python tools/ann_sweep.py            # table to stdout + JSON file
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import similarity as sim
from peskas_mozambique_data_pipeline_spark.session import get_spark, read_table

K = 5


def _queries(emb):
    return emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _truth(spark, emb):
    rows = sim.cosine_topk(_queries(emb), emb, k=K).collect()
    truth: dict[int, set[int]] = {}
    for r in rows:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    return truth


def _recall(rows, truth) -> float:
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    return hits / sum(len(t) for t in truth.values())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ann-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, sf_dir, "embeddings")
    emb.count()  # warm

    t0 = time.perf_counter()
    truth = _truth(spark, emb)
    brute_s = time.perf_counter() - t0

    results = {"sf_dir": sf_dir, "k": K, "brute_force_sec": round(brute_s, 3),
               "ivf": [], "lsh": []}

    assignments, centroids = sim.build_ivf_index(emb, n_centroids=8, n_iters=2)
    for n_probe in (1, 2, 4, 8):
        t0 = time.perf_counter()
        rows = sim.ivf_topk(
            _queries(emb), assignments, centroids, k=K, n_probe=n_probe
        ).collect()
        dt = time.perf_counter() - t0
        results["ivf"].append(
            {"n_probe": n_probe, "sec": round(dt, 3),
             "recall": round(_recall(rows, truth), 4)}
        )

    for n_tables in (1, 2, 4):
        t0 = time.perf_counter()
        rows = sim.lsh_topk(
            _queries(emb), emb, k=K, n_planes=6, dim=64, n_tables=n_tables
        ).collect()
        dt = time.perf_counter() - t0
        results["lsh"].append(
            {"n_tables": n_tables, "sec": round(dt, 3),
             "recall": round(_recall(rows, truth), 4)}
        )

    results["lsh_probe"] = []
    for n_probe in (1, 2, 4, 7):
        t0 = time.perf_counter()
        rows = sim.lsh_topk(
            _queries(emb), emb, k=K, n_planes=6, dim=64, n_probe=n_probe
        ).collect()
        dt = time.perf_counter() - t0
        results["lsh_probe"].append(
            {"n_probe": n_probe, "sec": round(dt, 3),
             "recall": round(_recall(rows, truth), 4)}
        )

    # PQ/ADC: recall governed by m (code granularity); search reads
    # codes only.  Build time is excluded (one-off, like IVF's).
    results["pq"] = []
    for m in (2, 4, 8):
        codes, books = sim.build_pq_index(emb, m=m, k=16, n_iters=2, dim=64)
        codes = codes.localCheckpoint()
        books = books.localCheckpoint()
        t0 = time.perf_counter()
        rows = sim.pq_topk(
            _queries(emb), codes, books, k_nn=K, m=m, k=16, dim=64
        ).collect()
        dt = time.perf_counter() - t0
        results["pq"].append(
            {"m": m, "sec": round(dt, 3),
             "recall": round(_recall(rows, truth), 4)}
        )

    # IVF routing + PQ scoring composed (the FAISS IVFx,PQy shape)
    codes, books = sim.build_pq_index(emb, m=8, k=16, n_iters=2, dim=64)
    results["ivfpq"] = []
    for n_probe in (2, 4):
        t0 = time.perf_counter()
        rows = sim.ivfpq_topk(
            _queries(emb), assignments, centroids, codes, books,
            k_nn=K, n_probe=n_probe, m=8, k=16, dim=64,
        ).collect()
        dt = time.perf_counter() - t0
        results["ivfpq"].append(
            {"n_probe": n_probe, "sec": round(dt, 3),
             "recall": round(_recall(rows, truth), 4)}
        )

    print(f"\nbrute force (ground truth): {brute_s:.2f}s  recall=1.0")
    print("tier  knob        sec   recall@5")
    for r in results["ivf"]:
        print(f"IVF   n_probe={r['n_probe']:<3} {r['sec']:>6.2f}  {r['recall']:.4f}")
    for r in results["lsh"]:
        print(f"LSH   n_tables={r['n_tables']:<2} {r['sec']:>6.2f}  {r['recall']:.4f}")
    for r in results["lsh_probe"]:
        print(f"LSH   n_probe={r['n_probe']:<3} {r['sec']:>6.2f}  {r['recall']:.4f}")
    for r in results["pq"]:
        print(f"PQ    m={r['m']:<8} {r['sec']:>6.2f}  {r['recall']:.4f}")
    for r in results["ivfpq"]:
        print(f"IVFPQ n_probe={r['n_probe']:<3} {r['sec']:>6.2f}  {r['recall']:.4f}")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "ann_sweep_last_run.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nwritten: {out}")
    spark.stop()


if __name__ == "__main__":
    main()
