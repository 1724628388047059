"""Retrieval-stack-from-zones demo: build the persistent indexes ONCE,
then serve lexical, semantic and hybrid queries purely from the stored
index zones — the corpus text/embeddings are never re-scanned at query
time.

    build:  BM25 postings (term-bucketed)  +  IVF index (centroid-
            partitioned inverted lists)  →  versioned zones
    append: +10% new docs/vectors — assignment-only deltas, no rebuild
    query:  BM25 top-k (bucket-pruned), IVF top-k (partition-pruned),
            hybrid RRF fusion of the two — all against the zones
    maintain: compact both indexes (fold deltas, vacuum versions)

Usage: python tools/retrieval_demo.py [sf_dir]  (default testdata/sf0.001)

Prints per-phase timings and result samples.  Proves the round-8
session-3 index-persistence modules (operators/ann_index.py,
operators/text_index.py) compose into the serve-time architecture
SCALE.md describes: query cost scales with probed lists/buckets, not
with corpus size, and appends cost O(new rows).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import ann_index, text_index
from peskas_mozambique_data_pipeline_spark.operators import similarity as sim_ops
from peskas_mozambique_data_pipeline_spark.operators.similarity import (
    reciprocal_rank_fusion,
)
from peskas_mozambique_data_pipeline_spark.plans.pipeline import PipelineZones
from peskas_mozambique_data_pipeline_spark.session import get_spark, read_table

TERMS = ["spark", "window", "merge"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="retrieval_zones_")
    zones = PipelineZones(root)

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base_docs = docs.filter(F.col("doc_id") % 10 != 0)
    new_docs = docs.filter(F.col("doc_id") % 10 == 0)
    base_emb = emb.filter(F.col("vec_id") % 10 != 0)
    new_emb = emb.filter(F.col("vec_id") % 10 == 0)

    t0 = time.time()
    postings, stats = text_index.build_bm25_postings(base_docs)
    text_index.save_bm25_index(zones, postings, stats)
    assignments, centroids = sim_ops.build_ivf_index(base_emb, n_centroids=8, n_iters=2)
    ann_index.save_ivf_index(zones, assignments, centroids)
    print(f"[build ] both indexes persisted in {time.time() - t0:.1f}s -> {root}")

    t0 = time.time()
    text_index.append_bm25_docs(zones, new_docs)
    ann_index.append_ivf_vectors(spark, zones, new_emb)
    print(f"[append] +{new_docs.count()} docs / +{new_emb.count()} vectors "
          f"as deltas in {time.time() - t0:.1f}s (no rebuild)")

    t0 = time.time()
    lex = text_index.bm25_topk_from_zone(spark, zones, TERMS, k=10)
    lex_rows = lex.collect()
    print(f"[query ] bm25 top-10 from zone in {time.time() - t0:.1f}s; "
          f"head: {[(r['doc_id'], r['score']) for r in lex_rows[:3]]}")

    queries = emb.filter(F.col("vec_id") == 100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t0 = time.time()
    sem = ann_index.ivf_topk_from_zone(spark, zones, queries, k=10, n_probe=3)
    sem_rows = sem.collect()
    print(f"[query ] ivf top-10 from zone in {time.time() - t0:.1f}s; "
          f"head: {[(r['neighbor_id'], r['cosine_sim']) for r in sem_rows[:3]]}")

    # hybrid: fuse the two candidate lists by reciprocal rank.  The
    # bm25 list is already score-ordered top-k; rank = position (the
    # window is over ≤k collected-side rows, never corpus-sized)
    t0 = time.time()
    from pyspark.sql import Window

    lex_c = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
        .alias("rank"),
    )
    sem_c = sem.select(F.col("neighbor_id").alias("doc_id"), "rank")
    fused = reciprocal_rank_fusion([lex_c, sem_c], top_n=5)
    print(f"[query ] hybrid RRF in {time.time() - t0:.1f}s; "
          f"top: {[tuple(r) for r in fused.collect()][:3]}")

    # retrieval-training export: mine DPR-style hard negatives AGAINST
    # the persistent IVF zone (partition-pruned probes — mining cost
    # tracks probed postings, not corpus size) and land the
    # (q, d+, ordered d-) triples as a versioned zone
    t0 = time.time()
    from peskas_mozambique_data_pipeline_spark.operators import mining
    from peskas_mozambique_data_pipeline_spark.plans.retrieval import (
        export_training_triples,
    )

    train_qvecs = emb.filter(F.col("vec_id").isin(100, 200, 300)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    positives_d = train_qvecs.select(
        "query_id", (F.col("query_id") % 97).alias("doc_id")
    )
    negs = mining.mine_hard_negatives_ivf(
        spark, zones, train_qvecs, positives_d, k=4, skip_top=1, n_probe=3
    )
    n_negs = negs.count()
    assert negs.join(
        positives_d, ["query_id", "doc_id"], "semi"
    ).count() == 0, "a labeled positive leaked into the negatives"
    train_qtexts = spark.createDataFrame(
        [(1, "spark window merge"), (2, "broadcast join shuffle")],
        "query_id long, query_text string",
    )
    positives_t = spark.createDataFrame(
        [(1, 3), (2, 7)], "query_id long, doc_id long"
    )
    export_training_triples(
        docs, train_qtexts, positives_t, zones=zones, k_neg=4, skip_top=1
    )
    from peskas_mozambique_data_pipeline_spark.io import parquet_io

    triples = parquet_io.read_latest(spark, root, "triples").collect()
    assert all(r.pos_id not in r.neg_ids for r in triples)
    print(f"[mine  ] {n_negs} IVF-zone hard negatives + "
          f"{len(triples)} training triples landed in {time.time() - t0:.1f}s")

    t0 = time.time()
    text_index.compact_bm25_index(spark, zones)
    ann_index.compact_ivf_index(spark, zones)
    print(f"[maint ] both indexes compacted in {time.time() - t0:.1f}s")

    lex2 = text_index.bm25_topk_from_zone(spark, zones, TERMS, k=10).collect()
    assert [tuple(r) for r in lex2] == [tuple(r) for r in lex_rows], "post-compact drift"
    print("[check ] post-compaction bm25 results identical")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
