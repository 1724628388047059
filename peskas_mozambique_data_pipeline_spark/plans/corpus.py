"""Corpus curation pipeline: the training-data analog of the fisheries
workflow DAG (``plans/pipeline.py``).

Composes the oracle-verified operators into the standard curation
sequence a large-scale LLM-data pipeline runs — quality gate →
near-duplicate clustering → representative selection → sequence packing
— with the same versioned-zone handoff and skip-if-fresh incremental
semantics as the reference's cron workflow
(.github/workflows/data-pipeline.yaml:69-230 for the stage shape).

Stage shapes at 100 TB:

* ``stage_quality``: scan-only (flags + keep are column predicates) —
  parallelism is the parquet split count, no shuffle.
* ``stage_dedup``: the MinHash family over ONE materialized shingle
  frame (see ``operators/dedup.shingle_hash_frame``), then min-label
  connected components; survivors are an anti-join of docs against
  non-representative cluster members (cluster representative = minimum
  doc id, deterministic).
* ``stage_pack``: per-stratum cumsum window — one shuffle on the
  stratum key; use a composite (lang, shard) key at scale so a single
  giant language doesn't serialize.

Nothing collects to the driver; every stage returns the written zone
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dedup_ops
from ..operators import text as text_ops
from .pipeline import PipelineZones


def curate_quality(docs: DataFrame, **filter_kw) -> DataFrame:
    """Docs surviving the C4/Gopher heuristic gate — a direct filter on
    the keep predicate (pure scan, zero shuffle); joining against the
    flags table would scan the corpus twice for nothing."""
    return docs.filter(text_ops.c4_keep_expr("text", **filter_kw))


def dedup_survivors(
    docs: DataFrame,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup removal: MinHash candidates → Jaccard verify → connected
    components → keep each cluster's minimum-id representative.

    Every doc outside a duplicate cluster survives untouched; inside a
    cluster only the representative (== component_id, the minimum
    member) survives — the deterministic "keep one, drop the rest".
    """
    hashed = dedup_ops.shingle_hash_frame(
        docs, id_col=id_col, shingle_k=shingle_k, materialize=True
    )
    pairs = dedup_ops.minhash_candidates_from_hashes(hashed, id_col=id_col)
    verified = dedup_ops.jaccard_verify_hashed(hashed, pairs, id_col=id_col).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    comp = dedup_ops.connected_components(verified)
    losers = comp.filter(F.col("node") != F.col("component_id")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def stage_quality(spark: SparkSession, docs: DataFrame, zones: PipelineZones) -> str:
    return zones.write(curate_quality(docs), "corpus_filtered")


def stage_dedup(
    spark: SparkSession, zones: PipelineZones, jaccard_threshold: float = 0.8
) -> str:
    filtered = zones.read(spark, "corpus_filtered")
    return zones.write(
        dedup_survivors(filtered, jaccard_threshold=jaccard_threshold),
        "corpus_deduped",
    )


def stage_pack(spark: SparkSession, zones: PipelineZones, budget: int = 1024) -> str:
    deduped = zones.read(spark, "corpus_deduped")
    return zones.write(
        text_ops.pack_documents(deduped, budget=budget), "corpus_packs"
    )


def run_corpus_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    zone_root: str,
    git_sha: str = "local",
    budget: int = 1024,
    jaccard_threshold: float = 0.8,
    skip_fresh: bool = False,
) -> dict[str, str]:
    """The full curation DAG through versioned zones.

    ``skip_fresh`` gives the same incremental-orchestration semantics
    as ``run_full_pipeline``: a stage is skipped when its product zone
    is at least as new as every upstream zone it derives from (and, per
    the round-3 lesson, a skip checks EVERY product the stage writes).
    """
    from ..io import parquet_io

    zones = PipelineZones(zone_root, git_sha)
    out: dict[str, str] = {}

    if skip_fresh and zones.is_fresh("corpus_filtered"):
        out["corpus_filtered"] = parquet_io.latest_version_path(
            zone_root, "corpus_filtered"
        )
    else:
        out["corpus_filtered"] = stage_quality(spark, docs, zones)

    if skip_fresh and zones.is_fresh("corpus_deduped", "corpus_filtered"):
        out["corpus_deduped"] = parquet_io.latest_version_path(
            zone_root, "corpus_deduped"
        )
    else:
        out["corpus_deduped"] = stage_dedup(
            spark, zones, jaccard_threshold=jaccard_threshold
        )

    if skip_fresh and zones.is_fresh("corpus_packs", "corpus_deduped"):
        out["corpus_packs"] = parquet_io.latest_version_path(zone_root, "corpus_packs")
    else:
        out["corpus_packs"] = stage_pack(spark, zones, budget=budget)
    return out
