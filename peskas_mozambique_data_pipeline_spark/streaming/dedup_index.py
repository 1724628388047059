"""Incremental near-duplicate index: streaming MinHash maintenance.

Batch near-dup detection (``operators/dedup.py``) recomputes the whole
corpus per run.  At ingest time the right shape is INCREMENTAL: each
micro-batch of new documents is

1. shingle-hashed + MinHash-signed (the same engine-portable
   signatures the batch path and the DuckDB oracle use),
2. LSH-checked against the ACCUMULATED signature index — an equi-join
   on (band, bucket), so each new doc only meets the corpus rows it
   collides with, never the whole index,
3. Jaccard-verified (exact, on the stored shingle-hash sets) for both
   batch-vs-corpus and within-batch pairs, and
4. appended to the index, so the next batch sees it.

Writes are idempotent per micro-batch (``batch=<id>`` subdirectory
overwrite, the same pattern as ``stream_to_versioned_zone``) — a batch
replayed after a crash between write and checkpoint commit overwrites
its own output.  Pair emission is exactly-once by construction: a
(corpus doc, new doc) pair is emitted only in the new doc's batch.

Scale: the index is partitioned parquet keyed by (band, bucket) join
columns; the per-batch join shuffles only the BATCH side against the
bucket-pruned index scan.  State lives in the zone, not the state
store — the streaming query itself is stateless, so there is no
watermark bound on how far back a duplicate can be detected.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dedup_ops

INDEX_SUBDIR = "minhash_index"
PAIRS_SUBDIR = "near_dup_pairs"


def _index_frame(
    batch_df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int,
    n_hashes: int,
    bands: int,
) -> DataFrame:
    """Per-batch index rows: (id, band, bucket, _h32).  Long form — one
    row per (doc, band) — so the index join is a plain equi-join and
    the shingle-hash set rides along for Jaccard verification."""
    hashed = dedup_ops.shingle_hash_frame(
        batch_df, text_col=text_col, id_col=id_col, shingle_k=shingle_k,
        materialize=True,
    )
    buckets = dedup_ops.band_buckets(hashed, id_col, n_hashes, bands)
    return buckets.join(hashed, id_col)


def _verified_pairs(
    new_rows: DataFrame, index_rows: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """(id_a < id_b) near-dup pairs between ``new_rows`` and
    ``index_rows`` — collide on (band, bucket), dedupe the candidate
    pair, Jaccard-verify on the stored hash sets."""
    a = new_rows.select(
        F.col(id_col).alias("id_n"), "band", "bucket", F.col("_h32").alias("h_n")
    )
    b = index_rows.select(
        F.col(id_col).alias("id_x"), "band", "bucket", F.col("_h32").alias("h_x")
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_n") != F.col("id_x"))
        .select(
            F.least("id_n", "id_x").alias("id_a"),
            F.greatest("id_n", "id_x").alias("id_b"),
            # hash sets are id-keyed; keep them aligned with the
            # normalized pair orientation
            F.when(F.col("id_n") < F.col("id_x"), F.col("h_n"))
            .otherwise(F.col("h_x"))
            .alias("h_a"),
            F.when(F.col("id_n") < F.col("id_x"), F.col("h_x"))
            .otherwise(F.col("h_n"))
            .alias("h_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect(F.col("h_a"), F.col("h_b")))
    union = F.size(F.col("h_a")) + F.size(F.col("h_b")) - inter
    return cand.select(
        "id_a",
        "id_b",
        F.round(inter.cast("double") / union, 6).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def stream_near_dup_index(
    df: DataFrame,
    zone_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    n_hashes: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    available_now: bool = True,
):
    """Start the incremental near-dup maintenance query over a document
    stream.  Returns ``(query, index_dir, pairs_dir)``.

    Each micro-batch emits the verified near-dup pairs it introduces
    (within-batch + batch-vs-accumulated-corpus) under
    ``pairs_dir/batch=<id>`` and appends its signatures under
    ``index_dir/batch=<id>`` — both idempotent overwrites keyed by the
    checkpoint's monotonic batch id.
    """
    index_dir = os.path.join(zone_dir, INDEX_SUBDIR)
    pairs_dir = os.path.join(zone_dir, PAIRS_SUBDIR)
    spark = df.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        new_rows = _index_frame(
            batch_df, text_col, id_col, shingle_k, n_hashes, bands
        ).localCheckpoint()  # several consumers below; compute once

        # within-batch pairs + batch-vs-corpus pairs.  The index read
        # is a plain parquet scan of everything previous batches wrote;
        # on a real cluster the (band, bucket) join keys prune via
        # shuffle-side bloom/DPP, and the batch side is the small side.
        from pyspark.errors import AnalysisException

        pairs = _verified_pairs(new_rows, new_rows, id_col, jaccard_threshold)
        try:
            existing = spark.read.parquet(index_dir)
            pairs = pairs.unionByName(
                _verified_pairs(new_rows, existing, id_col, jaccard_threshold)
            ).dropDuplicates(["id_a", "id_b"])
        except AnalysisException:
            pass  # first batch: no index yet
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"batch={batch_id}")
        )
        new_rows.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch={batch_id}")
        )

    writer = df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), index_dir, pairs_dir


def read_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """All near-dup pairs emitted so far (pair emission is exactly-once
    across batches, so this is a plain union read)."""
    return spark.read.parquet(pairs_dir).drop("batch")
