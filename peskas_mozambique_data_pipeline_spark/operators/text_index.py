"""Persistent BM25 inverted index zone.

``text.bm25_topk_indexed`` builds its postings in-job: every retrieval
session re-explodes the corpus.  Like the IVF index
(``operators/ann_index.py``), the postings belong in a zone — built
once, probed by every later session, appended incrementally:

* ``{prefix}_postings`` — one row per (doc, term): ``(id, term, tf,
  dl)``.  Persisted as a versioned EXTERNAL table **hash-bucketed on
  ``term``** (``io/parquet_io.write_bucketed_versioned``): term is
  far too high-cardinality for hive partitions, but bucketing gives
  the planner *bucket pruning* — a query-vocab ``term IN (...)``
  literal reads only the buckets the vocab hashes to
  (``SelectedBucketsCount`` in the plan; asserted in
  ``tests/test_text_index.py``), so probe I/O scales with vocab
  buckets, not corpus postings.  Caveat: Spark's
  DisableUnnecessaryBucketedScan rule drops bucketing (and with it
  the pruning) on filter-ONLY reads — the scoring plan keeps it
  because its df groupBy is on ``term``; a bare filtered export
  should set ``spark.sql.sources.bucketing.autoBucketedScan.enabled``
  =false for the read.
* ``{prefix}_stats`` — one row: ``(n_docs, sum_dl)``.  Exact integers,
  so incremental stats merge by ADDITION — ``avgdl`` and ``N`` at
  query time are always the fully-merged values (BM25's idf and length
  normalization are global; a stale N silently skews every score).
* ``{prefix}_postings_delta`` / ``{prefix}_stats_delta`` — appends.
  New documents explode to their own postings + a 1-row stats
  increment; readers union snapshot + deltas (compaction-cadence
  bounded), ``compact_bm25_index`` folds and vacuums — the
  snapshot+delta discipline of the streaming dedup index and the IVF
  zone.

Exact-parity contract: the query path scores through
``text.score_bm25_postings`` — the SAME float expression
``bm25_topk`` / ``bm25_topk_indexed`` use (and therefore the same
DuckDB oracle, already hash-verified as ``bm25_indexed``).  ``avgdl``
is reconstructed as the double quotient of the exact BIGINT
``sum_dl / n_docs`` — bit-identical to the in-job ``sum(_dl)/count``
aggregate, because both divide the same exact integers.  The
from-zone tier is pytest-pinned row-identical to ``bm25_topk_indexed``
on the same corpus, including after appends.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import parquet_io
from .text import score_bm25_postings, tokens

_POSTINGS = "_postings"
_STATS = "_stats"
_PDELTA = "_postings_delta"
_SDELTA = "_stats_delta"


def build_bm25_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """(postings, stats) for a corpus: the one-time index build.

    One corpus explode + tf groupBy (the single corpus-wide shuffle an
    inverted index costs — paid at build, not per query) and one
    pruned-column scan for the exact integer stats row.
    """
    toks = tokens(text_col)
    postings = (
        df.select(F.col(id_col), F.size(toks).alias("dl"), F.explode(toks).alias("term"))
        .groupBy(id_col, "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = df.select(F.size(toks).alias("_dl")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_dl").cast("long").alias("sum_dl"),
    )
    return postings, stats


def save_bm25_index(
    zones,
    postings: DataFrame,
    stats: DataFrame,
    prefix: str = "bm25",
    n_buckets: int = 8,
) -> dict[str, str]:
    paths = {}
    paths[prefix + _POSTINGS] = zones.write_bucketed(
        postings, prefix + _POSTINGS, ["term"], n_buckets=n_buckets
    )
    paths[prefix + _STATS] = zones.write(stats, prefix + _STATS)
    return paths


def _delta_names(zones, zone_prefix: str) -> list[str]:
    try:
        return parquet_io.list_versions(zones.root, zone_prefix)
    except FileNotFoundError:
        return []


def _live_delta_names(zones, zone_prefix: str, snapshot_prefix: str) -> list[str]:
    """Delta dirs NOT yet folded into the latest snapshot (per the
    snapshot's ledger) — what loaders and compaction must read.  A dir
    in the ledger but still on disk is a compaction-crash leftover:
    reading it would double-count."""
    folded, _ = parquet_io.folded_ledger(zones.root, snapshot_prefix)
    return [n for n in _delta_names(zones, zone_prefix) if n not in folded]


def _delta_paths(zones, zone_prefix: str, snapshot_prefix: str | None = None) -> list[str]:
    import os

    names = (
        _live_delta_names(zones, zone_prefix, snapshot_prefix)
        if snapshot_prefix
        else _delta_names(zones, zone_prefix)
    )
    return [os.path.join(zones.root, n) for n in names]


def append_bm25_docs(
    zones,
    new_docs: DataFrame,
    prefix: str = "bm25",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, str]:
    """Incremental add: postings + stats increment for the NEW docs
    only — the stored index is not read.  Version names carry a
    per-append suffix so same-second appends can't collide."""
    postings, stats = build_bm25_postings(new_docs, text_col, id_col)
    n = len(_delta_paths(zones, prefix + _PDELTA))
    out = {}
    out[prefix + _PDELTA] = parquet_io.write_versioned(
        postings, zones.root, prefix + _PDELTA, git_sha=f"{zones.git_sha}d{n}"
    )
    out[prefix + _SDELTA] = parquet_io.write_versioned(
        stats, zones.root, prefix + _SDELTA, git_sha=f"{zones.git_sha}d{n}"
    )
    return out


def load_bm25_postings(
    spark: SparkSession,
    zones,
    prefix: str = "bm25",
    terms: list[str] | None = None,
) -> DataFrame:
    """Snapshot + deltas, optionally pruned to a query vocabulary.
    The snapshot reads through the catalog so the ``term IN`` literal
    becomes bucket pruning; deltas are small plain reads."""
    parts = [zones.read_bucketed(spark, prefix + _POSTINGS)]
    parts.extend(
        spark.read.parquet(p)
        for p in _delta_paths(zones, prefix + _PDELTA, prefix + _POSTINGS)
    )
    if terms is not None:
        vocab = sorted(set(terms))
        parts = [p.filter(F.col("term").isin(vocab)) for p in parts]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def load_bm25_stats(spark: SparkSession, zones, prefix: str = "bm25") -> tuple[int, int]:
    """Fully-merged (n_docs, sum_dl) — snapshot plus every delta, in
    exact integer addition.  All 1-row frames union into ONE aggregate
    job (a collect per delta would schedule a job each — needless
    latency when appends have accumulated)."""
    frames = [zones.read(spark, prefix + _STATS)]
    frames.extend(
        spark.read.parquet(p)
        for p in _delta_paths(zones, prefix + _SDELTA, prefix + _STATS)
    )
    merged = frames[0]
    for f in frames[1:]:
        merged = merged.unionByName(f)
    row = merged.agg(
        F.sum("n_docs").cast("long").alias("n"),
        F.sum("sum_dl").cast("long").alias("s"),
    ).first()
    return int(row["n"]), int(row["s"])


def compact_bm25_index(
    spark: SparkSession,
    zones,
    prefix: str = "bm25",
    keep_last: int = 1,
    n_buckets: int = 8,
) -> dict[str, str]:
    """Fold postings + stats deltas into new snapshots, delete the
    folded delta dirs, vacuum superseded snapshot versions.

    Crash/replay safety is the folded LEDGER (``parquet_io
    .folded_ledger``), written inside each new snapshot BEFORE any
    deletion: it names every delta dir the snapshot contains plus the
    streaming batch-id high-water mark.  A crash between snapshot
    write and delta deletion leaves dirs the ledger already names —
    loaders and the next compaction ignore them (no double fold), and
    the next compaction sweeps them.  A streaming batch replayed after
    its delta was folded+deleted is skipped by the sink via the
    high-water mark (``streaming/index_sink.py``), so the ADDITIVE
    stats row can never be counted twice.
    """
    import os

    pnames = _live_delta_names(zones, prefix + _PDELTA, prefix + _POSTINGS)
    snames = _live_delta_names(zones, prefix + _SDELTA, prefix + _STATS)
    prev_p_folded, prev_hwm = parquet_io.folded_ledger(
        zones.root, prefix + _POSTINGS
    )
    prev_s_folded, _ = parquet_io.folded_ledger(zones.root, prefix + _STATS)
    folded = load_bm25_postings(spark, zones, prefix)
    n_docs, sum_dl = load_bm25_stats(spark, zones, prefix)
    stats = spark.createDataFrame([(n_docs, sum_dl)], "n_docs long, sum_dl long")
    nv = len(parquet_io.list_versions(zones.root, prefix + _POSTINGS))
    out = {}
    out[prefix + _POSTINGS] = parquet_io.write_bucketed_versioned(
        folded, zones.root, prefix + _POSTINGS, ["term"],
        n_buckets=n_buckets, git_sha=f"{zones.git_sha}c{nv}",
    )
    out[prefix + _STATS] = parquet_io.write_versioned(
        stats, zones.root, prefix + _STATS, git_sha=f"{zones.git_sha}c{nv}"
    )
    # ledger before any deletion: carry forward still-on-disk leftovers
    # from prior crashes, add this fold's names, advance the hwm
    hwm = prev_hwm
    for n in pnames + snames:
        b = parquet_io.stream_batch_id(n)
        if b is not None:
            hwm = max(hwm, b)
    existing = set(os.listdir(zones.root))
    parquet_io.write_folded_ledger(
        out[prefix + _POSTINGS], (prev_p_folded & existing) | set(pnames), hwm
    )
    parquet_io.write_folded_ledger(
        out[prefix + _STATS], (prev_s_folded & existing) | set(snames), hwm
    )
    for n in set(pnames) | set(snames) | (prev_p_folded & existing) | (
        prev_s_folded & existing
    ):
        shutil.rmtree(os.path.join(zones.root, n), ignore_errors=True)
    parquet_io.vacuum_zone(spark, zones.root, prefix + _POSTINGS, keep_last=keep_last)
    parquet_io.vacuum_zone(spark, zones.root, prefix + _STATS, keep_last=keep_last)
    return out


def bm25_topk_from_zone(
    spark: SparkSession,
    zones,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    prefix: str = "bm25",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k against the stored index: bucket-pruned postings read
    for the query vocabulary, globally-merged stats, the shared scoring
    tail.  Corpus text is never touched at query time."""
    terms = [str(t) for t in query_terms]
    if not terms:
        raise ValueError("query_terms must be non-empty")
    mult: dict[str, int] = {}
    for t in terms:
        mult[t] = mult.get(t, 0) + 1
    tframe = spark.createDataFrame(
        [(t, m) for t, m in sorted(mult.items())], "term string, _mult long"
    )
    matched = (
        load_bm25_postings(spark, zones, prefix, terms=terms)
        .join(F.broadcast(tframe), "term")
        .select(
            F.col(id_col),
            "term",
            F.col("tf").alias("_tf"),
            F.col("dl").alias("_dl"),
            "_mult",
        )
    )
    n_docs, sum_dl = load_bm25_stats(spark, zones, prefix)
    # the double quotient of the exact integers — bit-identical to the
    # in-job sum(_dl)/count aggregate the other tiers compute
    stats = spark.createDataFrame([(n_docs, sum_dl)], "n long, s long").select(
        (F.col("s") / F.col("n")).alias("_avgdl"),
        F.col("n").cast("double").alias("_n"),
    )
    return score_bm25_postings(matched, stats, k=k, k1=k1, b=b, id_col=id_col)
