"""Persistent IVF index zone: inverted lists as hive partitions.

The ANN operators in ``operators/similarity.py`` separate index BUILD
(`build_ivf_index` — Lloyd's k-means over the corpus) from PROBE
(`ivf_topk`), but both live in one job: every query session re-trains
the coarse quantizer, which at 100 TB means re-scanning the whole
embedding zone per session.  This module gives the index a *home* —
the same versioned-zone discipline every other curated product uses
(``io/parquet_io.py``, reference naming R/utils.R:30-52) — so the
k-means passes run once and every later session probes the stored
index.

Layout (the FAISS inverted-file shape [Johnson, Douze & Jégou 2017,
"Billion-scale similarity search with GPUs"] mapped onto parquet):

* ``{prefix}_centroids`` — the (C × d) coarse quantizer.  Tiny;
  plain versioned snapshot.
* ``{prefix}_postings`` — one row per corpus vector, written
  ``partitionBy("centroid_id")``: **each hive partition IS one
  inverted list.**  A probe that routes to ``n_probe`` of ``C``
  centroids reads only those directories — Spark turns the
  ``centroid_id IN (...)`` predicate into PartitionFilters, so probe
  I/O is ~``n_probe/C`` of the index instead of all of it
  (plan-asserted in ``tests/test_ann_index.py``).
* ``{prefix}_postings_delta`` — incremental adds.  New vectors are
  assigned to their nearest FROZEN centroid
  (``similarity.assign_to_centroids`` — the exact expression training
  used) and land as small versioned delta snapshots, also
  centroid-partitioned.  Readers union snapshot + all deltas;
  ``compact_ivf_index`` periodically folds deltas into a new postings
  snapshot — the snapshot+delta discipline of the streaming dedup
  index (``streaming/dedup_index.py``), minus the streaming.

Frozen-centroid semantics match FAISS ``IndexIVF.add``: appends never
move centroids (recall drifts as the corpus distribution drifts; the
remedy is a periodic re-train, which is just ``build_ivf_index`` +
``save_ivf_index`` writing the next version).  Because the assignment
rule is shared code, a compacted snapshot after appends is
row-identical to a frozen-centroid rebuild over the full corpus
(pytest-pinned).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import parquet_io
from . import similarity as sim_ops

_CENTROIDS = "_centroids"
_POSTINGS = "_postings"
_DELTA = "_postings_delta"


def save_ivf_index(
    zones,
    assignments: DataFrame,
    centroids: DataFrame,
    prefix: str = "ann_ivf",
) -> dict[str, str]:
    """Persist a built IVF index (the ``build_ivf_index`` output pair)
    as two versioned zones.  Postings are hive-partitioned on
    ``centroid_id`` — the inverted-list layout that makes probe-time
    partition pruning possible.  Returns ``{zone_prefix: path}``.
    """
    paths = {}
    paths[prefix + _CENTROIDS] = zones.write(centroids, prefix + _CENTROIDS)
    paths[prefix + _POSTINGS] = zones.write(
        assignments, prefix + _POSTINGS, partition_by=["centroid_id"]
    )
    return paths


def load_ivf_centroids(spark: SparkSession, zones, prefix: str = "ann_ivf") -> DataFrame:
    return zones.read(spark, prefix + _CENTROIDS)


def _delta_names(zones, prefix: str) -> list[str]:
    try:
        return parquet_io.list_versions(zones.root, prefix + _DELTA)
    except FileNotFoundError:
        return []


def _live_delta_names(zones, prefix: str) -> list[str]:
    """Delta dirs not yet folded into the latest postings snapshot per
    its ledger — compaction-crash leftovers would double-count."""
    folded, _ = parquet_io.folded_ledger(zones.root, prefix + _POSTINGS)
    return [n for n in _delta_names(zones, prefix) if n not in folded]


def _delta_paths(zones, prefix: str, live: bool = True) -> list[str]:
    names = _live_delta_names(zones, prefix) if live else _delta_names(zones, prefix)
    return [os.path.join(zones.root, n) for n in names]


def load_ivf_postings(
    spark: SparkSession,
    zones,
    prefix: str = "ann_ivf",
    centroid_ids: list[int] | None = None,
) -> DataFrame:
    """The accumulated posting lists: newest snapshot plus every delta
    written after it.  With ``centroid_ids`` the read is pruned to
    those inverted lists BEFORE the union — the filter lands in each
    scan's PartitionFilters, so unprobed lists contribute zero I/O.

    Bounded read: one snapshot + however many deltas have accumulated
    since the last ``compact_ivf_index`` (the compaction cadence bounds
    the count, exactly like the dedup index's ``compact_every``).
    """
    # each versioned dir is its own partitioned-table root, so deltas
    # load separately and union (Spark refuses multi-root partition
    # discovery in one read); delta count is compaction-bounded, so the
    # union width is too
    parts = [zones.read(spark, prefix + _POSTINGS)]
    parts.extend(spark.read.parquet(d) for d in _delta_paths(zones, prefix))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if centroid_ids is not None:
        out = out.filter(F.col("centroid_id").isin([int(c) for c in centroid_ids]))
    return out


def append_ivf_vectors(
    spark: SparkSession,
    zones,
    new_vectors: DataFrame,
    prefix: str = "ann_ivf",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Incremental add: assign ``new_vectors`` to their nearest FROZEN
    centroid and land them as a centroid-partitioned delta snapshot.

    Cost is one broadcast-assignment pass over the NEW rows only — the
    existing index is not read, let alone rebuilt.  The version name
    carries a per-append suffix so rapid appends in the same second
    can't collide on the timestamp.
    """
    centroids = load_ivf_centroids(spark, zones, prefix)
    assigned = sim_ops.assign_to_centroids(new_vectors, centroids, corpus_id, vec_col)
    # raw count (crash leftovers included) so sha suffixes never collide
    n_existing = len(_delta_paths(zones, prefix, live=False))
    return parquet_io.write_versioned(
        assigned,
        zones.root,
        prefix + _DELTA,
        git_sha=f"{zones.git_sha}d{n_existing}",
        partition_by=["centroid_id"],
    )


def compact_ivf_index(
    spark: SparkSession, zones, prefix: str = "ann_ivf", keep_last: int = 1
) -> str:
    """Fold snapshot + deltas into one new postings snapshot, then
    delete the folded delta dirs and vacuum superseded postings
    versions down to ``keep_last``.

    Crash/replay-safe via the folded ledger written inside the new
    snapshot BEFORE any deletion (see ``text_index.compact_bm25_index``
    for the full rationale): leftover folded dirs are never re-read,
    and the streaming sink skips batches at or below the ledger's
    high-water mark.
    """
    names = _live_delta_names(zones, prefix)
    prev_folded, prev_hwm = parquet_io.folded_ledger(
        zones.root, prefix + _POSTINGS
    )
    folded = load_ivf_postings(spark, zones, prefix)
    # per-compaction sha suffix: version names stay unique even when a
    # save and its first compaction land within the same second
    n_versions = len(parquet_io.list_versions(zones.root, prefix + _POSTINGS))
    path = parquet_io.write_versioned(
        folded,
        zones.root,
        prefix + _POSTINGS,
        git_sha=f"{zones.git_sha}c{n_versions}",
        partition_by=["centroid_id"],
    )
    hwm = prev_hwm
    for n in names:
        b = parquet_io.stream_batch_id(n)
        if b is not None:
            hwm = max(hwm, b)
    existing = set(os.listdir(zones.root))
    parquet_io.write_folded_ledger(
        path, (prev_folded & existing) | set(names), hwm
    )
    for n in set(names) | (prev_folded & existing):
        shutil.rmtree(os.path.join(zones.root, n), ignore_errors=True)
    parquet_io.vacuum_zone(spark, zones.root, prefix + _POSTINGS, keep_last=keep_last)
    return path


def ivf_topk_from_zone(
    spark: SparkSession,
    zones,
    queries: DataFrame,
    prefix: str = "ann_ivf",
    k: int = 5,
    n_probe: int = 2,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search against the stored index: route queries on the tiny
    centroid zone, read ONLY the probed inverted lists, then score with
    the standard ``ivf_topk`` probe join.

    The probed-centroid set is collected to the driver first — it is
    bounded by ``min(C, |Q|·n_probe)`` ids (index-constant, never
    corpus-sized) and turning it into literals is what lets the parquet
    source prune unprobed partitions; a join key alone cannot prune
    file listings.
    """
    centroids = load_ivf_centroids(spark, zones, prefix)
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
    probes = q.crossJoin(F.broadcast(centroids)).select(
        query_id,
        "centroid_id",
        (
            sim_ops._dot(F.col("_qv"), F.col("centroid"))
            / (sim_ops._norm(F.col("_qv")) * sim_ops._norm(F.col("centroid")))
        ).alias("_csim"),
    )
    from pyspark.sql import Window

    wq = Window.partitionBy(query_id).orderBy(
        F.col("_csim").desc(), F.col("centroid_id")
    )
    probed_ids = sorted(
        {
            int(r["centroid_id"])
            for r in probes.withColumn("_rk", F.row_number().over(wq))
            .filter(F.col("_rk") <= n_probe)
            .select("centroid_id")
            .distinct()
            .collect()
        }
    )
    postings = load_ivf_postings(spark, zones, prefix, centroid_ids=probed_ids)
    return sim_ops.ivf_topk(
        queries,
        postings,
        centroids,
        k=k,
        n_probe=n_probe,
        query_id=query_id,
        corpus_id=corpus_id,
        vec_col=vec_col,
    )


def save_ivf_index_int8(
    zones,
    assignments: DataFrame,
    centroids: DataFrame,
    prefix: str = "ann_ivf8",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[str, str]:
    """Persist the IVF index with int8-QUANTIZED posting vectors — the
    4× probe-I/O cut of ``similarity.quantize_embeddings_int8``
    composed with the inverted-list layout: at query time only the
    probed partitions are read AND each read row is a quarter the
    bytes.  Centroids stay float (C×d — routing precision is free).

    Cosine ranking over the codes needs no scales (they cancel —
    see ``similarity.cosine_topk_int8``); the per-vector ``q_scale``
    is stored anyway so the zone can also serve dequantize-style reads.
    """
    q = sim_ops.quantize_embeddings_int8(assignments, vec_col=vec_col)
    postings = q.select(corpus_id, "embedding_q", "q_scale", "centroid_id")
    paths = {}
    paths[prefix + _CENTROIDS] = zones.write(centroids, prefix + _CENTROIDS)
    paths[prefix + _POSTINGS] = zones.write(
        postings, prefix + _POSTINGS, partition_by=["centroid_id"]
    )
    return paths


def append_ivf_vectors_int8(
    spark: SparkSession,
    zones,
    new_vectors: DataFrame,
    prefix: str = "ann_ivf8",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Incremental add to the int8 IVF zone: route new vectors to their
    nearest FROZEN centroid, quantize them (per-vector symmetric scale
    — independent of every other row, so incremental quantization IS
    the rebuild's), and land the codes as a centroid-partitioned
    delta.  Same lifecycle as the float and PQ tiers: probes see the
    delta immediately, ``compact_ivf_index(prefix="ann_ivf8")`` folds
    it under the ledger guarantees."""
    centroids = load_ivf_centroids(spark, zones, prefix)
    assigned = sim_ops.assign_to_centroids(
        new_vectors, centroids, corpus_id, vec_col
    )
    q = sim_ops.quantize_embeddings_int8(assigned, vec_col=vec_col)
    postings = q.select(corpus_id, "embedding_q", "q_scale", "centroid_id")
    n_existing = len(_delta_paths(zones, prefix, live=False))
    return parquet_io.write_versioned(
        postings,
        zones.root,
        prefix + _DELTA,
        git_sha=f"{zones.git_sha}d{n_existing}",
        partition_by=["centroid_id"],
    )


def ivf_topk_int8_from_zone(
    spark: SparkSession,
    zones,
    queries: DataFrame,
    prefix: str = "ann_ivf8",
    k: int = 5,
    n_probe: int = 2,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search over the quantized zone: float-centroid routing →
    partition-pruned int8 postings read → exact integer-fold cosine
    over the codes (scales cancel; the only floats are IEEE sqrt/div —
    engine-exact, the ``ann_int8`` contract).

    With ``n_probe == C`` this is pytest-pinned row-identical to the
    brute-force ``cosine_topk_int8`` over the same quantization —
    the probe tier adds routing, not a different scorer.
    """
    from pyspark.sql import Window

    centroids = load_ivf_centroids(spark, zones, prefix)
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
    probes = q.crossJoin(F.broadcast(centroids)).select(
        query_id,
        "_qv",
        "centroid_id",
        (
            sim_ops._dot(F.col("_qv"), F.col("centroid"))
            / (sim_ops._norm(F.col("_qv")) * sim_ops._norm(F.col("centroid")))
        ).alias("_csim"),
    )
    wq = Window.partitionBy(query_id).orderBy(
        F.col("_csim").desc(), F.col("centroid_id")
    )
    probed = (
        probes.withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= n_probe)
        .select(query_id, "_qv", "centroid_id")
    )
    probed_ids = sorted(
        {int(r["centroid_id"]) for r in probed.select("centroid_id").distinct().collect()}
    )
    postings = load_ivf_postings(spark, zones, prefix, centroid_ids=probed_ids)

    # quantize the queries with the SAME rule the index stored
    qq = sim_ops.quantize_embeddings_int8(
        probed.select(query_id, F.col("_qv").alias(vec_col), "centroid_id"),
        vec_col=vec_col,
    ).select(query_id, F.col("embedding_q").alias("_qc"), "centroid_id")

    def _inorm2(col):
        sq = F.transform(col, lambda x: x.cast("bigint") * x.cast("bigint"))
        return F.aggregate(sq, F.lit(0).cast("bigint"), lambda a, v: a + v)

    cands = (
        postings.join(F.broadcast(qq), "centroid_id")
        .filter(F.col(query_id) != F.col(corpus_id))
        .withColumn("_qn2", _inorm2(F.col("_qc")))
        .withColumn("_cn2", _inorm2(F.col("embedding_q")))
        .filter((F.col("_qn2") > 0) & (F.col("_cn2") > 0))
    )
    idot = F.aggregate(
        F.zip_with(
            F.col("_qc"), F.col("embedding_q"),
            lambda x, y: x.cast("bigint") * y.cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda a, v: a + v,
    )
    scored = cands.select(
        query_id,
        corpus_id,
        (
            idot.cast("double")
            / (F.sqrt(F.col("_qn2").cast("double")) * F.sqrt(F.col("_cn2").cast("double")))
        ).alias("_cos"),
    )
    # a vector assigned to 2+ probed lists appears once per postings row
    # (rows are unique per corpus_id by construction), but a query
    # probing multiple lists meets each candidate at most once — rank
    # directly
    w = Window.partitionBy(query_id).orderBy(F.col("_cos").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            F.col(corpus_id).alias("neighbor_id"),
            "rank",
            F.round(F.col("_cos"), 6).alias("cosine_sim"),
        )
    )


def save_ivfpq_index(
    zones,
    ivf_assignments: DataFrame,
    ivf_centroids: DataFrame,
    pq_codes: DataFrame,
    pq_codebooks: DataFrame,
    prefix: str = "ann_ivfpq",
    corpus_id: str = "vec_id",
) -> dict[str, str]:
    """Persist the composed IVF+PQ index (the FAISS ``IVFx,PQy`` shape,
    ``similarity.ivfpq_topk``'s four frames) as zones.

    The two corpus-sized frames collapse into ONE: codes are stored
    WIDE (the m-array a probe actually consumes) and pre-joined with
    their IVF list id, hive-partitioned on ``centroid_id`` — so query
    time is a single partition-pruned scan of (id, codes m-array)
    rows.  ivfpq_topk's in-job plan pays that codes join per query
    session; the zone pays it once at save.  Codebooks (m·k rows) and
    centroids (C rows) are tiny plain zones.

    Per-row probe bytes: m small ints — narrower even than the int8
    tier; this is the layout whose probe I/O is independent of the
    original vector width.
    """
    codes_wide = pq_codes.groupBy(corpus_id).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))),
            lambda s: s.code,
        ).alias("_codes")
    )
    member = ivf_assignments.select(corpus_id, "centroid_id")
    postings = codes_wide.join(member, corpus_id)
    paths = {}
    paths[prefix + _CENTROIDS] = zones.write(ivf_centroids, prefix + _CENTROIDS)
    paths[prefix + "_codebooks"] = zones.write(pq_codebooks, prefix + "_codebooks")
    paths[prefix + _POSTINGS] = zones.write(
        postings, prefix + _POSTINGS, partition_by=["centroid_id"]
    )
    return paths


def append_ivfpq_vectors(
    spark: SparkSession,
    zones,
    new_vectors: DataFrame,
    prefix: str = "ann_ivfpq",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 2,
    dim: int = 64,
) -> str:
    """Incremental add to the IVF+PQ zone under FROZEN structures (the
    FAISS add semantics): route each new vector to its nearest stored
    IVF centroid, PQ-encode it against the stored codebooks
    (``similarity.pq_encode`` — the build's exact assignment rule), and
    land (id, wide codes, list id) as a centroid-partitioned delta.

    Cost is two broadcast joins over the NEW rows only; the existing
    index is never read.  The delta schema matches the snapshot, so
    ``ivfpq_topk_from_zone`` sees appended vectors immediately (its
    ``load_ivf_postings`` unions snapshot + deltas) and
    ``compact_ivf_index(prefix="ann_ivfpq")`` folds them with the
    ledger's replay/crash guarantees — every ANN tier now has the same
    build → append → probe → compact lifecycle.
    """
    centroids = load_ivf_centroids(spark, zones, prefix)
    codebooks = zones.read(spark, prefix + "_codebooks")
    assigned = sim_ops.assign_to_centroids(
        new_vectors, centroids, corpus_id, vec_col
    )
    codes = sim_ops.pq_encode(
        new_vectors, codebooks, m=m, dim=dim,
        corpus_id=corpus_id, vec_col=vec_col,
    )
    codes_wide = codes.groupBy(corpus_id).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))),
            lambda s: s.code,
        ).alias("_codes")
    )
    postings = codes_wide.join(
        assigned.select(corpus_id, "centroid_id"), corpus_id
    )
    n_existing = len(_delta_paths(zones, prefix, live=False))
    return parquet_io.write_versioned(
        postings,
        zones.root,
        prefix + _DELTA,
        git_sha=f"{zones.git_sha}d{n_existing}",
        partition_by=["centroid_id"],
    )


def ivfpq_topk_from_zone(
    spark: SparkSession,
    zones,
    queries: DataFrame,
    prefix: str = "ann_ivfpq",
    k_nn: int = 5,
    n_probe: int = 2,
    m: int = 2,
    k: int = 4,
    dim: int = 64,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ search against the stored index: float-centroid routing →
    ONE partition-pruned scan of the wide codes → ADC from broadcast
    distance tables.  The ADC expression chain is identical to
    ``similarity.ivfpq_topk`` (fixed subspace order), so from-zone
    results are row-identical to the in-job tier over the same built
    index (pytest-pinned)."""
    from pyspark.sql import Window

    d_sub = dim // m
    centroids = load_ivf_centroids(spark, zones, prefix)
    codebooks = zones.read(spark, prefix + "_codebooks")
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
    probes = q.crossJoin(F.broadcast(centroids)).select(
        query_id,
        "centroid_id",
        (
            sim_ops._dot(F.col("_qv"), F.col("centroid"))
            / (sim_ops._norm(F.col("_qv")) * sim_ops._norm(F.col("centroid")))
        ).alias("_csim"),
    )
    wq = Window.partitionBy(query_id).orderBy(
        F.col("_csim").desc(), F.col("centroid_id")
    )
    probed = (
        probes.withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= n_probe)
        .select(query_id, "centroid_id")
    )
    probed_ids = sorted(
        {int(r["centroid_id"]) for r in probed.select("centroid_id").distinct().collect()}
    )
    postings = load_ivf_postings(spark, zones, prefix, centroid_ids=probed_ids)
    cands = (
        postings.join(F.broadcast(probed), "centroid_id")
        .filter(F.col(query_id) != F.col(corpus_id))
        .select(query_id, corpus_id, "_codes")
    )
    q_sub = sim_ops._subspaces(queries.select(query_id, vec_col), vec_col, m, d_sub)
    dtab_long = q_sub.join(F.broadcast(codebooks), "subspace").select(
        query_id,
        (F.col("subspace") * k + F.col("centroid_id")).alias("_idx"),
        sim_ops._l2sq(F.col("subvec"), F.col("centroid")).alias("_d2"),
    )
    dtab = dtab_long.groupBy(query_id).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_idx", "_d2"))),
            lambda s: s._d2,
        ).alias("_dt")
    )
    scored = cands.join(F.broadcast(dtab), query_id)
    approx = None
    for s in range(m):
        entry = F.element_at(
            F.col("_dt"),
            (F.lit(s * k) + F.element_at(F.col("_codes"), s + 1) + 1).cast("int"),
        )
        approx = entry if approx is None else approx + entry
    scored = scored.withColumn("_ad", approx)
    w = Window.partitionBy(query_id).orderBy(F.col("_ad").asc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_nn)
        .select(
            query_id,
            F.col(corpus_id).alias("neighbor_id"),
            "rank",
            F.round(F.col("_ad"), 6).alias("approx_dist"),
        )
    )
