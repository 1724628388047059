"""Corpus-DAG-at-volume demo: run the FULL curation pipeline — every
optional stage enabled — over the driver testdata plus synthetic
refetch/boilerplate noise, and print per-zone row counts and timings.

    normalize → url_dedup → quality → classify → lang_segment →
    line_scrub →
    decontaminate → dedup → semantic → span_scrub → diversity →
    augment → pack → shuffle → export_shards → seq_layout

Usage: python tools/corpus_demo.py [sf_dir]   (default /root/testdata/sf0.001)

Proves the plans/corpus.py DAG composes end to end with sixteen of its
stages active (incl. the token-budget training-shard export and the
concat-and-split sequence layout), that each stage's zone lands versioned and
range-partitioned, and that nothing in the composition collects a
corpus to the driver (timings stay flat in the doc count).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import classifier
from peskas_mozambique_data_pipeline_spark.plans import corpus
from peskas_mozambique_data_pipeline_spark.session import get_spark, read_table


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_table(spark, sf_dir, "documents")
    n0 = docs.count()
    # synthetic crawl metadata: a URL per doc, with every 10th doc a
    # tracking-param refetch of its predecessor (same canonical URL)
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
            F.lit(".example.org/p/"),
            F.col("doc_id").cast("string"),
        )
    )
    refetch_text = F.when(
        (F.col("doc_id") % 10 == 9) & (F.col("doc_id") > 0),
        F.concat(F.lit("  "), F.col("text"), F.lit("\r\n")),
    ).otherwise(F.col("text"))
    docs = docs.withColumn("url", url).withColumn("text", refetch_text)

    embeddings = read_table(spark, sf_dir, "embeddings")
    benchmark = docs.filter(F.col("doc_id") % 501 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    seed = docs.limit(40).select(
        "doc_id", "text", (F.col("doc_id") % 2).cast("int").alias("label")
    )
    weights, bias = classifier.fit_hashed_nb(seed, dim=4096)

    zone_root = tempfile.mkdtemp(prefix="corpus_demo_")
    t0 = time.time()
    out = corpus.run_corpus_pipeline(
        spark,
        docs,
        zone_root,
        budget=256,
        jaccard_threshold=0.6,
        normalize=True,
        unicode_form="NFKC",
        url_col="url",
        classifier_weights=weights,
        classifier_bias=bias,
        classifier_threshold=-100.0,  # gate wired in, permissive demo cut
        classifier_dim=4096,
        scrub_lines=True,
        segment_langs=True,
        benchmark=benchmark,
        embeddings=embeddings,
        semantic_threshold=0.2,
        scrub_spans=True,
        diversity_budget=64,
        diversity_strata=4,
        shuffle_salt="epoch0",
        shard_tokens=2048,
        seq_len=512,
        fim_rate=0.25,
    )
    wall = time.time() - t0

    order = [
        "corpus_normalized",
        "corpus_url_deduped",
        "corpus_filtered",
        "corpus_classified",
        "corpus_lang_segmented",
        "corpus_line_scrubbed",
        "corpus_decontaminated",
        "corpus_deduped",
        "corpus_semantic",
        "corpus_scrubbed",
        "corpus_diverse",
        "corpus_packs",
        "corpus_augmented",
        "corpus_shuffled",
        "training_shards",
        "sequence_layout",
    ]
    print(f"input docs: {n0}   wall: {wall:.1f}s   zones: {len(out)}")
    missing = [z for z in order if z not in out]
    for z in order:
        if z in out:
            print(f"  {z:24s} {spark.read.parquet(out[z]).count():6d} rows")
    if missing:
        print(f"MISSING ZONES: {missing}")
        return 1

    # the data-sheet view of the same run (plans/report.py)
    from peskas_mozambique_data_pipeline_spark.plans import report

    print("corpus card:")
    for r in report.corpus_card(spark, out).orderBy("pos").collect():
        toks = "-" if r.n_tokens is None else r.n_tokens
        ret = "-" if r.retained_rows_permille is None else f"{r.retained_rows_permille}‰"
        print(f"  {r.zone:24s} rows={r.n_rows:<7d} tokens={toks:<9} retained={ret}")

    # release notarization: seal WHAT ships, record WHERE it came from
    from peskas_mozambique_data_pipeline_spark.plans.pipeline import PipelineZones

    zones = PipelineZones(zone_root)
    n_rel, fp = zones.seal(spark, "training_shards")
    ups = [z for z in ("corpus_shuffled", "corpus_packs", "corpus_deduped")
           if z in out]
    prov = zones.record_provenance("training_shards", ups)
    clean = zones.verify(spark, "training_shards").count() == 0
    print(f"release: training_shards rows={n_rel} fp={fp[:16]}… "
          f"verify={'clean' if clean else 'MISMATCH'} inputs={prov}")
    if not clean:
        return 1
    spark.stop()
    shutil.rmtree(zone_root, ignore_errors=True)
    print("corpus demo OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
