"""Streaming appends into the persistent retrieval indexes.

The batch appenders (``operators/text_index.append_bm25_docs``,
``operators/ann_index.append_ivf_vectors``) keep the stored BM25/IVF
indexes fresh between rebuilds; this module turns them into
``foreachBatch`` sinks so a *stream* of new documents/vectors feeds
the same zones — the index equivalent of ``ingest.stream_to_versioned
_zone``.

Exactly-once shape (the repo-standard idempotent-sink pattern): a
micro-batch's delta lands at a path derived from its BATCH ID
(``{prefix}_postings_delta__<batch_id as 14 digits>_stream__``) with
``overwrite`` mode, so a batch replayed after a failure between write
and checkpoint commit overwrites its own delta instead of
double-counting it — which matters doubly here because the BM25
*stats* delta is additive (a duplicated stats row would silently skew
every idf/avgdl downstream; pytest pins the replay case).  The padded
batch id satisfies the zone version regex, so ``list_versions`` and
the batch compactors see streaming deltas exactly like batch deltas:
``compact_bm25_index`` / ``compact_ivf_index`` fold them unchanged.

The replay window extends past compaction via the FOLDED LEDGER
(ADVICE r8): compaction records, inside the new snapshot, the delta
dir names it folded plus the max folded stream batch id.  A batch
replayed AFTER its delta was folded+deleted would otherwise re-write
the delta and be double-counted at the next fold; the sink skips any
``batch_id <= hwm`` instead, so ``maintain_indexes`` may run at any
time — no coordination with in-flight micro-batches required.

IVF streaming adds are frozen-centroid (``assign_to_centroids`` with
the stored centroids, re-read per batch — C×d, negligible), identical
to the batch append semantics: the stream never moves centroids;
re-training stays a batch job that writes the next index version.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..io import parquet_io
from ..operators import ann_index, text_index
from ..operators import similarity as sim_ops


def _delta_dir(zones, zone_prefix: str, batch_id: int) -> str:
    # 14-digit zero-padded batch id in the timestamp slot: matches
    # VERSION_RE, is replay-stable, and never collides with wall-clock
    # timestamps (real ones start with the year)
    return os.path.join(zones.root, f"{zone_prefix}__{batch_id:014d}_stream__")


def bm25_index_sink(
    zones,
    prefix: str = "bm25",
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """A ``foreachBatch`` handler appending each micro-batch of NEW
    documents to the BM25 index zone::

        docs_stream.writeStream.foreachBatch(bm25_index_sink(zones))
            .option("checkpointLocation", cp).start()
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # replay-after-compaction guard: a batch at or below the folded
        # high-water mark is already IN the snapshot (its delta was
        # folded and deleted) — rewriting it would double-count the
        # additive stats row at the next fold
        _, hwm = parquet_io.folded_ledger(zones.root, prefix + "_postings")
        if batch_id <= hwm:
            return
        postings, stats = text_index.build_bm25_postings(
            batch_df, text_col=text_col, id_col=id_col
        )
        postings.write.mode("overwrite").parquet(
            _delta_dir(zones, prefix + "_postings_delta", batch_id)
        )
        stats.write.mode("overwrite").parquet(
            _delta_dir(zones, prefix + "_stats_delta", batch_id)
        )

    return handle


def ivf_index_sink(
    zones,
    prefix: str = "ann_ivf",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
):
    """A ``foreachBatch`` handler appending each micro-batch of NEW
    vectors to the IVF index zone (frozen-centroid assignment)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        _, hwm = parquet_io.folded_ledger(zones.root, prefix + "_postings")
        if batch_id <= hwm:
            return
        spark = batch_df.sparkSession
        centroids = ann_index.load_ivf_centroids(spark, zones, prefix)
        assigned = sim_ops.assign_to_centroids(
            batch_df, centroids, corpus_id, vec_col
        )
        assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
            _delta_dir(zones, prefix + "_postings_delta", batch_id)
        )

    return handle


def ivfpq_index_sink(
    zones,
    prefix: str = "ann_ivfpq",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 2,
    dim: int = 64,
):
    """A ``foreachBatch`` handler appending each micro-batch of NEW
    vectors to the IVF+PQ zone (frozen centroids AND codebooks) — the
    same exactly-once shape as the other sinks: batch-id delta path +
    overwrite + the folded high-water-mark skip."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        _, hwm = parquet_io.folded_ledger(zones.root, prefix + "_postings")
        if batch_id <= hwm:
            return
        spark = batch_df.sparkSession
        centroids = ann_index.load_ivf_centroids(spark, zones, prefix)
        codebooks = zones.read(spark, prefix + "_codebooks")
        assigned = sim_ops.assign_to_centroids(
            batch_df, centroids, corpus_id, vec_col
        )
        codes = sim_ops.pq_encode(
            batch_df, codebooks, m=m, dim=dim,
            corpus_id=corpus_id, vec_col=vec_col,
        )
        from pyspark.sql import functions as F

        codes_wide = codes.groupBy(corpus_id).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("subspace", "code"))),
                lambda s: s.code,
            ).alias("_codes")
        )
        postings = codes_wide.join(
            assigned.select(corpus_id, "centroid_id"), corpus_id
        )
        postings.write.mode("overwrite").partitionBy("centroid_id").parquet(
            _delta_dir(zones, prefix + "_postings_delta", batch_id)
        )

    return handle
