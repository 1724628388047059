"""Manifest-backed data-skipping index: per-file column min/max zone
maps recorded at write time, consulted by a pruned reader.

Parquet footers already carry min/max statistics, but at 100 TB a
reader cannot open a million footers to decide which files to scan —
the metadata walk IS the bottleneck (the reason lakehouse table
formats keep file-level stats in a manifest, e.g. Delta's Add-file
stats and Iceberg's manifest entries).  This module keeps that
manifest next to the zone:

* :func:`skipping_index` — ONE distributed scan of a written zone,
  keyed by zone-relative file path, aggregating min/max/null-count
  for the named columns (map-side combinable; the shuffle carries
  #files rows).
* :func:`write_skipping_index` — persists the index under
  ``<zone>/_skipping`` (underscore-prefixed, so Spark's parquet
  reader ignores it when scanning the zone itself).
* :func:`prune_files` — applies conjunctive range predicates TO THE
  INDEX (a #files-row frame, filtered distributively; only candidate
  file names are collected) and returns the candidate paths.
* :func:`read_pruned` — reads only the candidate files and re-applies
  the predicate as a residual filter, so pruning is a pure
  optimization: the result is ALWAYS exactly
  ``spark.read.parquet(zone).filter(pred)`` (pytest-pinned), pruning
  can only drop files the predicate provably cannot match.

Pairing with the layout operators: ``write_zordered`` (or
``write_versioned(range_by=...)``) makes per-file envelopes TIGHT on
the clustered columns, so a k-dim box predicate touches a corner of
the file list instead of all of it — ``tests/test_skipping.py``
measures the candidate counts against the parquet-footer ground truth.

Skipping semantics (standard zone-map rules):

* a file is a candidate for ``lo <= c <= hi`` iff
  ``max(c) >= lo AND min(c) <= hi``;
* a file whose ``c`` is entirely NULL has NULL min/max and cannot
  match a range predicate — pruned;
* NULL rows inside a kept file are dropped by the residual filter;
* a column with no index entry keeps every file (never prune on
  missing evidence).

This family is pytest-verified rather than oracle-registered: the
index content depends on the physical file split (partitioning-
dependent by nature), while the pruned READ result is identical to a
plain filter — which the registered rows already hash-verify.
"""

from __future__ import annotations

import os
import re as _re
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SKIPPING_DIR = "_skipping"


def _rel_file(path: str):
    return F.regexp_replace(
        F.input_file_name(), "^.*" + _re.escape(path.rstrip("/")) + "/", ""
    )


def skipping_index(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Per-file zone map over a written zone: one row per data file —
    ``(file, n_rows, min_<c>, max_<c>, nnull_<c> ...)`` in the
    columns' native types.  One scan, map-side combinable, #files
    rows out."""
    df = spark.read.parquet(path)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"skipping columns not in zone schema: {missing}")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
        aggs.append(
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"nnull_{c}")
        )
    return (
        df.select(_rel_file(path).alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def write_skipping_index(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> str:
    """Build and persist the zone map under ``<zone>/_skipping``
    (one small parquet — #files rows; Spark ignores underscore dirs
    when reading the zone).  Re-writing replaces the index atomically
    enough for a single-writer zone (the zone itself is immutable —
    versioned snapshots — so the index is written once per version)."""
    idx = skipping_index(spark, path, cols)
    out = os.path.join(path.rstrip("/"), SKIPPING_DIR)
    idx.coalesce(1).write.mode("overwrite").parquet(out)
    return out


def read_skipping_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path.rstrip("/"), SKIPPING_DIR))


def _candidate_cond(idx_cols: Sequence[str], ranges: Mapping) -> F.Column:
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        if f"min_{c}" not in idx_cols:
            # no evidence for this column — cannot prune on it
            continue
        leg = F.col(f"max_{c}").isNotNull() & F.col(f"min_{c}").isNotNull()
        if lo is not None:
            leg = leg & (F.col(f"max_{c}") >= F.lit(lo))
        if hi is not None:
            leg = leg & (F.col(f"min_{c}") <= F.lit(hi))
        cond = cond & leg
    return cond


def prune_files(
    spark: SparkSession, path: str, ranges: Mapping
) -> list[str]:
    """Candidate files for conjunctive range predicates
    ``{col: (lo, hi)}`` (either bound may be None = unbounded).  The
    predicate runs on the INDEX frame; only matching file names are
    collected — at a million files the driver holds candidate names,
    not the whole manifest."""
    idx = read_skipping_index(spark, path)
    rows = idx.filter(_candidate_cond(idx.columns, ranges)).select(
        "file"
    ).collect()
    root = path.rstrip("/")
    return [os.path.join(root, r.file) for r in rows]


def _residual_filter(df: DataFrame, ranges: Mapping) -> DataFrame:
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            df = df.filter(F.col(c) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(c) <= F.lit(hi))
    return df


def read_pruned(
    spark: SparkSession,
    path: str,
    ranges: Mapping,
    max_candidate_fraction: float = 0.5,
) -> DataFrame:
    """Read only the candidate files and re-apply the predicate as a
    residual filter — bit-identical to filtering the full zone, paying
    only candidate-file scan cost.  An empty candidate list returns an
    empty frame with the zone's schema.

    At-scale guards:

    * The candidate COUNT is decided on the index frame first (two
      aggregates over #files rows); candidate NAMES are collected on
      the driver only when the candidate fraction is at most
      ``max_candidate_fraction``.  For a weak predicate the candidate
      list approaches the full manifest — collecting a million file
      names buys no scan savings and funnels them through driver
      memory and per-path launch overhead, so the reader short-circuits
      to a plain ``read.parquet(zone).filter(pred)`` and lets
      Catalyst/footer pushdown do the residual pruning.
    * Candidate files are read with ``basePath`` pinned to the zone
      root, so on a partitioned zone (``write_versioned(...,
      partition_by=...)``) the partition columns are recovered from
      the directory layout instead of silently reading NULL.
    """
    idx = read_skipping_index(spark, path)
    cond = _candidate_cond(idx.columns, ranges)
    stats = idx.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(cond, F.lit(1))).alias("n_cand"),
    ).collect()[0]
    if stats.n_total > 0 and (
        stats.n_cand > max_candidate_fraction * stats.n_total
    ):
        return _residual_filter(spark.read.parquet(path), ranges)
    rows = idx.filter(cond).select("file").collect()
    root = path.rstrip("/")
    files = [os.path.join(root, r.file) for r in rows]
    full_schema = spark.read.parquet(path).schema
    if not files:
        return spark.createDataFrame([], full_schema)
    df = (
        spark.read.schema(full_schema)
        .option("basePath", root)
        .parquet(*files)
    )
    return _residual_filter(df, ranges)
