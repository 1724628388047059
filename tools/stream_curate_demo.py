"""Streaming-curation-to-batch-DAG demo (VERDICT r9 Next #6): file-stream
a landing zone through the full stream-safe gate chain —

    robots → quality → classifier → bloom decontamination →
    URL refetch dedup → content digest dedup

— into a curated parquet zone, then run the BATCH-ONLY stages of
``plans/corpus.run_corpus_pipeline`` (near-dup clustering, packing,
shuffle) over that zone, proving the lambda split composes: a document
admitted by the stream is a document the batch DAG admits (the batch
quality gate is a verified no-op over stream survivors).

Usage: python tools/stream_curate_demo.py [sf_dir]
       (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import classifier, web as web_ops
from peskas_mozambique_data_pipeline_spark.plans import corpus
from peskas_mozambique_data_pipeline_spark.session import get_spark, read_table
from peskas_mozambique_data_pipeline_spark.streaming import curate as sc
from peskas_mozambique_data_pipeline_spark.streaming import ingest as si


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_table(spark, sf_dir, "documents")
    n0 = docs.count()
    # synthetic crawl metadata (the corpus_demo generator): URL per doc,
    # every 10th doc a tracking-param refetch of its predecessor, plus
    # an arrival timestamp and a robots-disallowed slice
    url = F.when(
        (F.col("doc_id") % 10 == 9) & (F.col("doc_id") > 0),
        F.concat(
            F.lit("https://www.crawl"),
            ((F.col("doc_id") - 1) % 7).cast("string"),
            F.lit(".example.org/p/"),
            (F.col("doc_id") - 1).cast("string"),
            F.lit("?utm_source=refetch"),
        ),
    ).otherwise(
        F.concat(
            F.lit("http://crawl"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.org/"),
            F.when(F.col("doc_id") % 13 == 0, F.lit("tmp/")).otherwise(
                F.lit("p/")
            ),
            F.col("doc_id").cast("string"),
        )
    )
    landing_docs = docs.select(
        "doc_id",
        "lang",
        "source",
        F.to_timestamp(
            F.lit("2024-01-01 00:00:00")
        ).alias("ts"),
        url.alias("url"),
        "text",
    )

    # robots: every crawlN host disallows /tmp/ (RFC 9309 wildcard rule
    # exercised via the $-anchored variant on crawl0)
    rules_rows = [
        (f"crawl{i}.example.org",
         "User-agent: *\nDisallow: /tmp/\n"
         + ("Disallow: /*.gif$\n" if i == 0 else ""))
        for i in range(7)
    ]
    robots = web_ops.parse_robots(
        spark.createDataFrame(rules_rows, "host string, robots_txt string")
    )

    benchmark = docs.filter(F.col("doc_id") % 501 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    seed = docs.limit(40).select(
        "doc_id", "text", (F.col("doc_id") % 2).cast("int").alias("label")
    )
    weights, bias = classifier.fit_hashed_nb(seed, dim=4096)
    wmap = {r["feature"]: r["w_nano"] for r in weights.collect()}

    work = tempfile.mkdtemp(prefix="stream_curate_demo_")
    landing = os.path.join(work, "landing")
    curated_dir = os.path.join(work, "curated")
    ckpt = os.path.join(work, "ckpt")
    zone_root = os.path.join(work, "zones")
    landing_docs.repartition(8).write.parquet(landing)

    t0 = time.time()
    stream = si.stream_landing_zone(
        spark, landing, spark.read.parquet(landing).schema,
        max_files_per_trigger=4,
    )
    curated_stream = sc.stream_curate(
        stream,
        url_col="url",
        robots_rules=robots,
        classifier_weights=wmap,
        classifier_bias=bias,
        classifier_threshold=-10.0,
        classifier_dim=4096,
        benchmark=benchmark,
    )
    q = si.write_zone(curated_stream, curated_dir, ckpt)
    q.awaitTermination(600)
    t_stream = time.time() - t0

    curated = spark.read.parquet(curated_dir)
    n_curated = curated.count()
    print(f"landing: {n0} docs -> stream-curated: {n_curated} "
          f"[{t_stream:.1f}s]")

    # batch-only stages over the curated zone
    t1 = time.time()
    out = corpus.run_corpus_pipeline(
        spark,
        curated.select("doc_id", "lang", "source", "text"),
        zone_root,
        budget=512,
        jaccard_threshold=0.8,
        shuffle_salt="epoch0",
    )
    t_batch = time.time() - t1
    zones = corpus.PipelineZones(zone_root)
    n_filtered = zones.read(spark, "corpus_filtered").count()
    for name in out:
        print(f"  zone {name}: {zones.read(spark, name).count()} rows")
    print(f"batch stages: [{t_batch:.1f}s]")

    ok = n_filtered == n_curated  # batch quality gate no-op on stream output
    print("batch quality gate no-op over stream survivors:", ok)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
