"""Persistent BM25 index zone (operators/text_index.py): cross-tier
parity with bm25_topk_indexed, incremental appends with exact global
stats merge, compaction, and bucket-pruned vocabulary reads."""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.io import parquet_io
from peskas_mozambique_data_pipeline_spark.operators import text as text_ops
from peskas_mozambique_data_pipeline_spark.operators import text_index
from peskas_mozambique_data_pipeline_spark.plans.pipeline import PipelineZones
import pytest

SF = "/root/testdata/sf0.001"
TERMS = ["spark", "window", "merge", "spark"]  # duplicate → multiplicity


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_zone_query_matches_indexed_tier(spark, tmp_path):
    docs = _docs(spark)
    zones = PipelineZones(str(tmp_path))
    postings, stats = text_index.build_bm25_postings(docs)
    text_index.save_bm25_index(zones, postings, stats)

    expected = text_ops.bm25_topk_indexed(docs, TERMS, k=25)
    got = text_index.bm25_topk_from_zone(spark, zones, TERMS, k=25)
    assert rows(got) == rows(expected)


def test_append_merges_stats_globally(spark, tmp_path):
    """After an append, idf/avgdl must reflect the FULL corpus — the
    from-zone result equals the in-job indexed tier over everything."""
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 4 != 0)
    extra = docs.filter(F.col("doc_id") % 4 == 0)
    zones = PipelineZones(str(tmp_path))

    postings, stats = text_index.build_bm25_postings(base)
    text_index.save_bm25_index(zones, postings, stats)
    text_index.append_bm25_docs(zones, extra)

    expected = text_ops.bm25_topk_indexed(docs, TERMS, k=25)
    got = text_index.bm25_topk_from_zone(spark, zones, TERMS, k=25)
    assert rows(got) == rows(expected)

    n_docs, sum_dl = text_index.load_bm25_stats(spark, zones)
    assert n_docs == docs.count()


@pytest.mark.slow
def test_compaction_folds_and_preserves(spark, tmp_path):
    docs = _docs(spark)
    zones = PipelineZones(str(tmp_path))
    p, s = text_index.build_bm25_postings(docs.filter(F.col("doc_id") < 300))
    text_index.save_bm25_index(zones, p, s)
    text_index.append_bm25_docs(zones, docs.filter(F.col("doc_id") >= 300))

    before = rows(text_index.bm25_topk_from_zone(spark, zones, TERMS, k=25))
    text_index.compact_bm25_index(spark, zones)

    assert text_index._delta_paths(zones, "bm25_postings_delta") == []
    assert text_index._delta_paths(zones, "bm25_stats_delta") == []
    assert len(parquet_io.list_versions(str(tmp_path), "bm25_postings")) == 1
    assert rows(text_index.bm25_topk_from_zone(spark, zones, TERMS, k=25)) == before
    # folded index still matches the in-job tier
    assert before == rows(text_ops.bm25_topk_indexed(docs, TERMS, k=25))


def test_vocab_query_prunes_buckets(spark, tmp_path):
    """The full retrieval plan reads only the buckets the query vocab
    hashes to.  Asserted on the QUERY plan, not a bare filtered load:
    Spark's DisableUnnecessaryBucketedScan rule turns bucketing off for
    filter-only reads (it doesn't credit bucket pruning as a benefit),
    but the scoring plan's groupBy("term") keeps the bucketed scan —
    and with it SelectedBucketsCount — alive."""
    docs = _docs(spark)
    zones = PipelineZones(str(tmp_path))
    postings, stats = text_index.build_bm25_postings(docs)
    text_index.save_bm25_index(zones, postings, stats, n_buckets=8)

    q = text_index.bm25_topk_from_zone(spark, zones, ["spark"], k=10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "SelectedBucketsCount" in plan
    seg = plan.split("SelectedBucketsCount")[1][:40]
    n_sel = int(seg.split(":")[1].strip().split(" ")[0])
    assert n_sel < 8
