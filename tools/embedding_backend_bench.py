"""A/B the two embedding pairwise-cosine backends at $SPARK_GRAFT_SF_DIR:

* JVM column-fold (zip_with + aggregate, triangle-de-skewed) — the
  oracle path (bit-reproducible in DuckDB).
* Arrow/numpy applyInPandas (one matmul per label block).

Prints per-backend p50 of 3 runs and the pair-set parity check.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark import registry_text
from peskas_mozambique_data_pipeline_spark.operators import similarity as sim
from peskas_mozambique_data_pipeline_spark.session import get_spark, read_table


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="emb-backend-bench")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, sf_dir, "embeddings")
    emb.count()

    def timed(make):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            make().write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        return runs[1]

    jvm = timed(lambda: registry_text.q_embedding_near_dup(spark, sf_dir))
    pandas_df = lambda: sim.cosine_pairs_pandas(
        emb.select("label", F.col("vec_id").alias("id"), "embedding"),
        block_col="label", id_col="id", threshold=0.35,
    )
    arrow = timed(pandas_df)

    a = {(r.id_a, r.id_b) for r in
         registry_text.q_embedding_near_dup(spark, sf_dir).collect()}
    b = {(r.id_a, r.id_b) for r in pandas_df().collect()}
    print(f"jvm_fold_p50_s={jvm:.2f}  arrow_matmul_p50_s={arrow:.2f}")
    print(f"pair_sets_equal={a == b}  n_pairs={len(a)}")
    spark.stop()


if __name__ == "__main__":
    main()


def topk_ab() -> None:
    """Secondary A/B: brute-force top-k, JVM fold vs mapInPandas BLAS."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="topk-backend-bench")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, sf_dir, "embeddings")
    emb.count()
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def timed(make):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            make().write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        return runs[1]

    jvm = timed(lambda: sim.cosine_topk(queries, emb, k=5))
    arrow = timed(lambda: sim.cosine_topk_pandas(queries, emb, k=5))
    a = {(r.query_id, r.neighbor_id, r.rank)
         for r in sim.cosine_topk(queries, emb, k=5).collect()}
    b = {(r.query_id, r.neighbor_id, r.rank)
         for r in sim.cosine_topk_pandas(queries, emb, k=5).collect()}
    print(f"topk: jvm_p50_s={jvm:.2f}  arrow_p50_s={arrow:.2f}  equal={a == b}")
    spark.stop()
