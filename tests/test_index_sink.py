"""Streaming appends into the persistent retrieval indexes
(streaming/index_sink.py): stream-fed zone == batch index over the
same corpus, and replayed batches don't double-count."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import ann_index, text_index
from peskas_mozambique_data_pipeline_spark.operators import similarity as sim_ops
from peskas_mozambique_data_pipeline_spark.operators import text as text_ops
from peskas_mozambique_data_pipeline_spark.plans.pipeline import PipelineZones
from peskas_mozambique_data_pipeline_spark.streaming import index_sink
import pytest

SF = "/root/testdata/sf0.001"
TERMS = ["spark", "window", "merge"]


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )


@pytest.mark.slow
def test_streamed_bm25_appends_match_batch_index(spark, tmp_path):
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 3 == 0)
    extra = docs.filter(F.col("doc_id") % 3 != 0)
    zones = PipelineZones(str(tmp_path / "zones"))
    p, s = text_index.build_bm25_postings(base)
    text_index.save_bm25_index(zones, p, s)

    # feed the remaining docs through a file stream into the index sink
    src = str(tmp_path / "incoming")
    extra.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(extra.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(index_sink.bm25_index_sink(zones))
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = text_index.bm25_topk_from_zone(spark, zones, TERMS, k=25)
    expected = text_ops.bm25_topk_indexed(docs, TERMS, k=25)
    assert rows(got) == rows(expected)
    n_docs, _ = text_index.load_bm25_stats(spark, zones)
    assert n_docs == docs.count()

    # streaming deltas fold through the ordinary batch compactor
    text_index.compact_bm25_index(spark, zones)
    assert text_index._delta_paths(zones, "bm25_postings_delta") == []
    assert rows(
        text_index.bm25_topk_from_zone(spark, zones, TERMS, k=25)
    ) == rows(expected)


def test_bm25_sink_replay_is_idempotent(spark, tmp_path):
    """A batch replayed after a failure must overwrite its own delta —
    the stats row is additive, so a duplicate would skew every idf."""
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") < 250)
    extra = docs.filter(F.col("doc_id") >= 250)
    zones = PipelineZones(str(tmp_path))
    p, s = text_index.build_bm25_postings(base)
    text_index.save_bm25_index(zones, p, s)

    handle = index_sink.bm25_index_sink(zones)
    handle(extra, 0)
    once = rows(text_index.bm25_topk_from_zone(spark, zones, TERMS, k=25))
    n_once, dl_once = text_index.load_bm25_stats(spark, zones)
    handle(extra, 0)  # replay
    assert text_index.load_bm25_stats(spark, zones) == (n_once, dl_once)
    assert rows(text_index.bm25_topk_from_zone(spark, zones, TERMS, k=25)) == once


def test_streamed_ivf_appends_match_frozen_rebuild(spark, tmp_path):
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") % 4 != 0)
    extra = emb.filter(F.col("vec_id") % 4 == 0)
    zones = PipelineZones(str(tmp_path / "zones"))
    assignments, centroids = sim_ops.build_ivf_index(base, n_centroids=4, n_iters=2)
    ann_index.save_ivf_index(zones, assignments, centroids)

    src = str(tmp_path / "vectors")
    extra.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(extra.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(index_sink.ivf_index_sink(zones))
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    full_assign = sim_ops.assign_to_centroids(emb, centroids)
    assert rows(
        ann_index.load_ivf_postings(spark, zones).select("vec_id", "centroid_id")
    ) == rows(full_assign.select("vec_id", "centroid_id"))


def test_ensure_indexes_skip_if_fresh_and_maintain(spark, tmp_path):
    """plans/retrieval.py: ensure_* builds once, no-ops while fresh,
    rebuilds after the corpus zone moves; maintain folds only when
    deltas exist."""
    import time

    from peskas_mozambique_data_pipeline_spark.plans import retrieval

    docs = _docs(spark)
    zones = PipelineZones(str(tmp_path))
    zones.write(docs, "corpus_shuffled")

    built = retrieval.ensure_bm25_index(spark, zones)
    assert built is not None
    assert retrieval.ensure_bm25_index(spark, zones) is None  # fresh → no-op

    # nothing to fold → maintain is a no-op for every tier
    assert not any(retrieval.maintain_indexes(spark, zones).values())

    # an append creates deltas → maintain folds them
    handle = index_sink.bm25_index_sink(zones)
    handle(docs.limit(10), 0)
    assert retrieval.maintain_indexes(spark, zones)["bm25"] is True
    assert text_index._delta_paths(zones, "bm25_postings_delta") == []

    # corpus zone moves forward → the index is stale → rebuild fires
    time.sleep(1.1)  # version timestamps have 1s granularity
    zones.write(docs.limit(400), "corpus_shuffled")
    assert retrieval.ensure_bm25_index(spark, zones) is not None
    n_docs, _ = text_index.load_bm25_stats(spark, zones)
    assert n_docs == 400

    # maintenance also bounds the rebuild-versioned stats zone
    from peskas_mozambique_data_pipeline_spark.io import parquet_io

    assert len(parquet_io.list_versions(str(tmp_path), "bm25_stats")) >= 2
    retrieval.maintain_indexes(spark, zones)
    assert len(parquet_io.list_versions(str(tmp_path), "bm25_stats")) == 1
    n_docs, _ = text_index.load_bm25_stats(spark, zones)
    assert n_docs == 400  # retention kept the newest stats


@pytest.mark.slow
def test_bm25_replay_after_compaction_not_double_counted(spark, tmp_path):
    """ADVICE r8: the exactly-once window must survive compaction.  A
    batch whose delta was folded+deleted and then REPLAYED (checkpoint
    hadn't committed) must be skipped via the folded high-water mark —
    otherwise the next fold double-counts its postings and the additive
    stats row."""
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") < 250)
    extra = docs.filter(F.col("doc_id") >= 250)
    zones = PipelineZones(str(tmp_path))
    p, s = text_index.build_bm25_postings(base)
    text_index.save_bm25_index(zones, p, s)

    handle = index_sink.bm25_index_sink(zones)
    handle(extra, 0)
    text_index.compact_bm25_index(spark, zones)  # folds + deletes delta 0
    stats_after = text_index.load_bm25_stats(spark, zones)
    topk_after = rows(text_index.bm25_topk_from_zone(spark, zones, TERMS, k=25))

    handle(extra, 0)  # replay of the already-folded batch
    # the sink must NOT re-write the delta...
    assert text_index._delta_paths(zones, "bm25_postings_delta") == []
    assert text_index.load_bm25_stats(spark, zones) == stats_after
    # ...and a subsequent compaction still can't double-count
    text_index.compact_bm25_index(spark, zones)
    assert text_index.load_bm25_stats(spark, zones) == stats_after
    assert rows(text_index.bm25_topk_from_zone(spark, zones, TERMS, k=25)) == topk_after


def test_bm25_compaction_crash_leftover_not_refolded(spark, tmp_path):
    """Crash between snapshot write and delta deletion: the leftover
    delta dir is named in the new snapshot's ledger, so loaders ignore
    it and the next compaction sweeps it without refolding."""
    import shutil

    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") < 250)
    extra = docs.filter(F.col("doc_id") >= 250)
    zones = PipelineZones(str(tmp_path))
    p, s = text_index.build_bm25_postings(base)
    text_index.save_bm25_index(zones, p, s)

    handle = index_sink.bm25_index_sink(zones)
    handle(extra, 0)
    # snapshot the delta dirs, compact, then "crash-restore" them as if
    # deletion never ran
    deltas = text_index._delta_paths(zones, "bm25_postings_delta") + \
        text_index._delta_paths(zones, "bm25_stats_delta")
    saved = {d: str(tmp_path / ("bak%d" % i)) for i, d in enumerate(deltas)}
    for d, b in saved.items():
        shutil.copytree(d, b)
    text_index.compact_bm25_index(spark, zones)
    stats_clean = text_index.load_bm25_stats(spark, zones)
    for d, b in saved.items():
        shutil.copytree(b, d)  # leftover dirs reappear

    # loaders ignore ledgered leftovers
    assert text_index.load_bm25_stats(spark, zones) == stats_clean
    assert text_index._delta_paths(
        zones, "bm25_postings_delta", "bm25_postings"
    ) == []
    # next compaction sweeps them and the totals stay exact
    text_index.compact_bm25_index(spark, zones)
    assert text_index.load_bm25_stats(spark, zones) == stats_clean
    import os as _os

    assert not any(_os.path.exists(d) for d in saved)


def test_ivf_replay_after_compaction_skipped(spark, tmp_path):
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") % 4 != 0)
    extra = emb.filter(F.col("vec_id") % 4 == 0)
    zones = PipelineZones(str(tmp_path))
    assignments, centroids = sim_ops.build_ivf_index(base, n_centroids=4, n_iters=2)
    ann_index.save_ivf_index(zones, assignments, centroids)

    handle = index_sink.ivf_index_sink(zones)
    handle(extra, 0)
    ann_index.compact_ivf_index(spark, zones)
    n_after = ann_index.load_ivf_postings(spark, zones).count()
    handle(extra, 0)  # replay post-fold: must be skipped
    assert ann_index._delta_paths(zones, "ann_ivf") == []
    assert ann_index.load_ivf_postings(spark, zones).count() == n_after


@pytest.mark.slow
def test_streamed_ivfpq_appends_match_frozen_rebuild(spark, tmp_path):
    """IVF+PQ streaming sink: stream-fed zone == frozen-structure
    encode of the full corpus, with the replay-after-compaction skip."""
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") % 4 != 0)
    extra = emb.filter(F.col("vec_id") % 4 == 0)
    zones = PipelineZones(str(tmp_path))
    ivf_assign, ivf_cents = sim_ops.build_ivf_index(base, n_centroids=4, n_iters=2)
    pq_codes, pq_books = sim_ops.build_pq_index(base, m=2, k=4, n_iters=2, dim=64)
    ann_index.save_ivfpq_index(zones, ivf_assign, ivf_cents, pq_codes, pq_books)

    handle = index_sink.ivfpq_index_sink(zones, m=2, dim=64)
    handle(extra, 0)
    full_assign = sim_ops.assign_to_centroids(emb, ivf_cents)
    got = rows(
        ann_index.load_ivf_postings(spark, zones, "ann_ivfpq").select(
            "vec_id", "centroid_id"
        )
    )
    assert got == rows(full_assign.select("vec_id", "centroid_id"))

    # replay pre-compaction: overwrite, not duplicate
    handle(extra, 0)
    assert (
        ann_index.load_ivf_postings(spark, zones, "ann_ivfpq").count()
        == emb.count()
    )
    # replay post-compaction: skipped via the ledger hwm
    ann_index.compact_ivf_index(spark, zones, prefix="ann_ivfpq")
    handle(extra, 0)
    assert ann_index._delta_paths(zones, "ann_ivfpq") == []
    assert (
        ann_index.load_ivf_postings(spark, zones, "ann_ivfpq").count()
        == emb.count()
    )


def test_maintain_sweeps_ann_crash_leftover_without_new_delta(spark, tmp_path):
    """ADVICE r9: a ledgered compaction-crash leftover ALONE must
    trigger the ANN sweep on the next maintenance tick — the guard uses
    the raw delta listing (like the BM25 guard), not live-only."""
    import shutil

    from peskas_mozambique_data_pipeline_spark.plans import retrieval

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") % 4 != 0)
    extra = emb.filter(F.col("vec_id") % 4 == 0)
    zones = PipelineZones(str(tmp_path))
    assignments, centroids = sim_ops.build_ivf_index(base, n_centroids=4, n_iters=2)
    ann_index.save_ivf_index(zones, assignments, centroids)

    handle = index_sink.ivf_index_sink(zones)
    handle(extra, 0)
    deltas = ann_index._delta_paths(zones, "ann_ivf")
    saved = {d: str(tmp_path / ("annbak%d" % i)) for i, d in enumerate(deltas)}
    for d, b in saved.items():
        shutil.copytree(d, b)
    ann_index.compact_ivf_index(spark, zones)
    n_clean = ann_index.load_ivf_postings(spark, zones).count()
    for d, b in saved.items():
        shutil.copytree(b, d)  # crash leftovers reappear, no live delta

    assert ann_index._delta_paths(zones, "ann_ivf") == []  # live view empty
    out = retrieval.maintain_indexes(spark, zones)
    assert out["ann_ivf"] is True  # leftover alone triggered the sweep
    import os as _os

    assert not any(_os.path.exists(d) for d in saved)
    assert ann_index.load_ivf_postings(spark, zones).count() == n_clean
