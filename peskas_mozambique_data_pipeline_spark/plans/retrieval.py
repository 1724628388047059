"""Retrieval-index orchestration: keep the persistent BM25 + IVF
zones built, fresh, and bounded — the index counterpart of the corpus
DAG (``plans/corpus.py``), with the same skip-if-fresh incremental
semantics and the compact/vacuum maintenance pair.

Lifecycle a production retrieval stack runs on a schedule:

1. ``ensure_bm25_index`` / ``ensure_ivf_index`` — (re)build ONLY when
   the index is missing or older than its corpus zone (``is_fresh`` on
   the version timestamps — metadata-only check, no data read).
   Between rebuilds the indexes stay current through the batch
   appenders (``operators/*_index``) or the streaming sinks
   (``streaming/index_sink``).
2. ``maintain_indexes`` — fold accumulated deltas into new snapshots
   and vacuum superseded versions (compact = bounded read fan-in,
   vacuum = bounded storage; the standing maintenance pair every
   incremental zone needs).

A rebuild is a NEW VERSION of the index zones — readers flip
atomically, in-flight probes of the old version are unaffected (the
repo-wide immutable-zone contract).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..io import parquet_io
from ..operators import ann_index, text_index
from ..operators import similarity as sim_ops
from .pipeline import PipelineZones


def _clear_deltas(zones: PipelineZones, zone_prefix: str) -> None:
    import os
    import shutil

    try:
        names = parquet_io.list_versions(zones.root, zone_prefix)
    except FileNotFoundError:
        return
    for n in names:
        shutil.rmtree(os.path.join(zones.root, n), ignore_errors=True)


def ensure_bm25_index(
    spark: SparkSession,
    zones: PipelineZones,
    corpus_zone: str = "corpus_shuffled",
    prefix: str = "bm25",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, str] | None:
    """(Re)build the BM25 index iff it is missing or staler than the
    corpus zone it indexes.  Returns the written paths, or ``None``
    when the index was already fresh (no data touched)."""
    if zones.is_fresh(prefix + "_postings", corpus_zone):
        return None
    docs = zones.read(spark, corpus_zone)
    postings, stats = text_index.build_bm25_postings(docs, text_col, id_col)
    out = text_index.save_bm25_index(zones, postings, stats, prefix=prefix)
    # a rebuild mirrors the corpus zone — deltas from the previous index
    # generation are subsumed (and a stale stats delta would silently
    # double-count into the additive merge)
    _clear_deltas(zones, prefix + "_postings_delta")
    _clear_deltas(zones, prefix + "_stats_delta")
    return out


def ensure_ivf_index(
    spark: SparkSession,
    zones: PipelineZones,
    embeddings_zone: str = "corpus_embeddings",
    prefix: str = "ann_ivf",
    n_centroids: int = 16,
    n_iters: int = 2,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    int8: bool = False,
) -> dict[str, str] | None:
    """(Re)build the IVF index iff missing or staler than its embedding
    zone.  ``int8=True`` persists quantized postings (the 4× probe-I/O
    tier).  Rebuild = re-trained centroids — the periodic answer to
    frozen-centroid recall drift from incremental adds."""
    if zones.is_fresh(prefix + "_postings", embeddings_zone):
        return None
    emb = zones.read(spark, embeddings_zone)
    assignments, centroids = sim_ops.build_ivf_index(
        emb, n_centroids=n_centroids, n_iters=n_iters,
        corpus_id=corpus_id, vec_col=vec_col,
    )
    if int8:
        out = ann_index.save_ivf_index_int8(
            zones, assignments, centroids, prefix=prefix,
            corpus_id=corpus_id, vec_col=vec_col,
        )
    else:
        out = ann_index.save_ivf_index(zones, assignments, centroids, prefix=prefix)
    _clear_deltas(zones, prefix + "_postings_delta")
    return out


def maintain_indexes(
    spark: SparkSession,
    zones: PipelineZones,
    bm25_prefix: str = "bm25",
    ivf_prefix: str = "ann_ivf",
    ann_prefixes: tuple[str, ...] | None = None,
    keep_last: int = 1,
) -> dict[str, bool]:
    """Compaction pass: fold deltas (batch or streaming) into fresh
    snapshots and vacuum superseded versions.  Skips an index whose
    zone doesn't exist yet; skips compaction when there are no deltas
    (nothing to fold — the no-op guard that makes this safe to run on
    every schedule tick).  The ledger makes this safe to run while
    streams are mid-batch (``streaming/index_sink.py``).

    ``ann_prefixes`` maintains every IVF-layout tier in one pass —
    defaults to (``ivf_prefix``, ``ann_ivf8``, ``ann_ivfpq``), the
    float/int8/PQ zones, all of which share the centroid-partitioned
    delta lifecycle and ``compact_ivf_index``.
    """
    prefixes = ann_prefixes or (ivf_prefix, "ann_ivf8", "ann_ivfpq")
    out: dict[str, bool] = {"bm25": False}
    if text_index._delta_paths(zones, bm25_prefix + "_postings_delta"):
        text_index.compact_bm25_index(spark, zones, bm25_prefix, keep_last=keep_last)
        out["bm25"] = True
    for p in prefixes:
        compacted = False
        # gate on the RAW delta listing (live=False), matching the BM25
        # guard above: a ledgered crash leftover alone must trigger the
        # sweep, not wait for a new live delta to arrive (ADVICE r9)
        if ann_index._delta_paths(zones, p, live=False):
            ann_index.compact_ivf_index(spark, zones, p, keep_last=keep_last)
            compacted = True
        out[p] = compacted
    out["ivf"] = out.get(ivf_prefix, False)  # back-compat key
    # rebuilds version up the centroid/stats/codebook zones too —
    # retention applies to every index zone, not just postings (a zone
    # nobody vacuums grows one full copy per rebuild)
    side_zones = [bm25_prefix + "_stats"]
    for p in prefixes:
        side_zones.append(p + "_centroids")
        side_zones.append(p + "_codebooks")
    for zone_prefix in side_zones:
        try:
            parquet_io.vacuum_zone(spark, zones.root, zone_prefix, keep_last=keep_last)
        except FileNotFoundError:
            pass
    return out


def export_training_triples(
    corpus,
    queries,
    positives,
    zones: PipelineZones | None = None,
    k_neg: int = 4,
    skip_top: int = 0,
    zone_prefix: str = "triples",
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Dual-encoder training export: one row per (query, positive)
    pair carrying that query's ``k_neg`` BM25 hard negatives as an
    ordered array — the (q, d⁺, {d⁻}) triples a contrastive trainer
    consumes (in-batch negatives come free at train time; these are
    the MINED ones).

    Shape: the miners run once for ALL queries
    (``operators/mining.py`` — queries are data, not plan); negatives
    collapse to one bounded array per query (≤ k_neg ids,
    sort-by-rank via array_sort on (rank, id) structs — order-free
    agg, deterministic array); positives join back broadcastless on
    query_id (both sides query-grain).  With ``zones`` the table
    lands as a versioned zone (write path inherits manifest/seal
    machinery); otherwise the DataFrame returns for the caller.
    """
    from pyspark.sql import functions as F

    from ..operators.mining import mine_hard_negatives

    neg = mine_hard_negatives(
        corpus,
        queries,
        positives,
        k=k_neg,
        skip_top=skip_top,
        text_col=text_col,
        id_col=id_col,
    )
    neg_arr = neg.groupBy("query_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("neg_rank", F.col(id_col)))
            ),
            lambda s: s[id_col],
        ).alias("neg_ids")
    )
    triples = (
        positives.select("query_id", F.col(id_col).alias("pos_id"))
        .join(queries, "query_id")
        .join(neg_arr, "query_id", "left")
        .withColumn(
            "neg_ids",
            # empty-array fallback typed from the mined side: id_col is
            # parametric, so a string doc id must coalesce to
            # array<string>, not silently widen from array<long>
            F.coalesce(
                F.col("neg_ids"),
                F.array().cast(neg_arr.schema["neg_ids"].dataType),
            ),
        )
    )
    if zones is None:
        return triples
    return zones.write(triples, zone_prefix)
