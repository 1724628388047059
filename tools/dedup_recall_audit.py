"""Measured LSH recall/precision vs the exact prefix-filter tier —
the empirical check on ``dedup.lsh_banding_plan``'s S-curve theory.

For each candidate banding of an ``n_hashes``-hash signature:

1. ground truth = ``jaccard_prefix_pairs`` (lossless AllPairs blocking
   — every pair with J ≥ t, none missed),
2. LSH candidates = ``minhash_candidates_from_hashes`` at (bands, r),
3. recall  = |truth ∩ candidates| / |truth|      (pairs LSH would verify)
   precision = |truth ∩ candidates| / |candidates|  (verify-cost yield)
4. printed next to the S-curve's predicted P(candidate | s = t).

Usage: python tools/dedup_recall_audit.py [sf_dir] [threshold]
       (defaults /root/testdata/sf0.001, 0.5)

Why a tool and not an operator: banding choice affects COST and
RECALL, never correctness (every candidate is exact-verified
downstream), so this is a sizing instrument a pipeline owner runs
when re-dialing ``n_hashes``/``bands`` — the ann_sweep.py posture
applied to the dedup family.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import dedup
from peskas_mozambique_data_pipeline_spark.session import get_spark, read_table


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    n_hashes = 8  # the engine's configured permutation count
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = read_table(spark, sf_dir, "documents")
        hashed = dedup.shingle_hash_frame(docs, materialize=True).localCheckpoint()

        t0 = time.time()
        truth = {
            (r["id_a"], r["id_b"])
            for r in dedup.jaccard_prefix_pairs(
                hashed, threshold=threshold
            ).collect()
        }
        print(
            f"exact tier: {len(truth)} pairs with J >= {threshold} "
            f"({time.time() - t0:.1f}s)"
        )
        if not truth:
            print("no ground-truth pairs at this threshold; lower it")
            return 0

        print(f"{'bands':>5} {'rows':>4} {'cands':>8} {'recall':>7} "
              f"{'precision':>9} {'S-curve P(t)':>12}")
        for bands in (1, 2, 4, 8):
            rows = n_hashes // bands
            cand = {
                (r["id_a"], r["id_b"])
                for r in dedup.minhash_candidates_from_hashes(
                    hashed, n_hashes=n_hashes, bands=bands
                ).collect()
            }
            hit = truth & cand
            recall = len(hit) / len(truth)
            precision = len(hit) / len(cand) if cand else float("nan")
            p_theory = 1.0 - (1.0 - threshold**rows) ** bands
            print(f"{bands:>5} {rows:>4} {len(cand):>8} {recall:>7.3f} "
                  f"{precision:>9.3f} {p_theory:>12.3f}")

        plan = dedup.lsh_banding_plan(n_hashes, threshold)
        print("lsh_banding_plan pick:", plan["bands"], "bands x",
              plan["rows_per_band"], "rows")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
