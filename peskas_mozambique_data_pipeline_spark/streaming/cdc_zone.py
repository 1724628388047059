"""Merge-on-read CDC zone: an ordered change stream (upserts +
deletes, globally monotonic sequence numbers — a CDC source's LSNs)
maintained incrementally on plain parquet, with the current TABLE
STATE resolvable at any time and a compaction that bounds read cost.

The lakehouse shape without a table format: change batches land as
immutable delta dirs, readers merge on read, compaction folds the
merge forward —

* each micro-batch writes its raw change rows under ``batch=<id>``
  with ``mode=overwrite`` — a replayed batch rewrites the identical
  delta over itself (idempotent by construction);
* :func:`read_cdc_state` resolves the state: per key the
  highest-``seq`` change wins, delete winners drop the key, upsert
  winners carry the payload (exactly ``operators/merge.py::
  apply_cdc`` semantics over everything the stream has carried —
  pytest-pinned against it);
* compaction folds batches ``<= current − 1`` into an ``upto=<id>``
  snapshot holding only the WINNING UPSERT rows (tombstones drop:
  sequence numbers are monotonic, so any future change to a deleted
  key out-ranks the tombstone anyway, and an absent key reads the
  same as a deleted one), writes BEFORE deleting the folded dirs,
  and every read skips deltas ``<= snapshot id`` — a crash between
  snapshot write and delta delete re-reads snapshot + post-snapshot
  deltas only, and the per-key window re-resolving an already-won
  row is a no-op.

Scale shape: deltas are change-sized; the merge-on-read window is
per-key (parallel across keys, never a global funnel) over snapshot +
post-snapshot deltas — compaction cadence bounds that working set.
The read pays the merge (that is the MOR trade); a zone read a
thousand times between changes should compact first (the snapshot
alone IS the state — the window over it finds one row per key).

Determinism: winners are (key, seq) unique by the apply_cdc contract;
the strict guard is applied at READ (a folded assert fails the
resolve on duplicate (key, seq) or unknown ops rather than silently
picking a partition-dependent winner).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .dedup_index import _dir_ids
from .distinct_ledger import _read_parts

CDC_SUBDIR = "cdc_changes"
CDC_COMPACT_SUBDIR = "cdc_compacted"


def _winners(
    parts: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str,
    upsert_op: str,
    delete_op: str,
    strict: bool,
) -> DataFrame:
    """Latest change per key across everything readable (compacted
    snapshots re-enter as plain upsert rows carrying their original
    seq, so the fold is associative and replay-safe)."""
    k = list(keys)
    w = Window.partitionBy(*k).orderBy(F.col(seq_col).desc())
    ranked = parts.withColumn("_rn", F.row_number().over(w))
    if strict:
        dup = F.count(F.lit(1)).over(Window.partitionBy(*k, seq_col))
        guard = F.assert_true(
            (dup == 1) & F.col(op_col).isin(upsert_op, delete_op),
            F.lit("cdc_zone: duplicate (key, seq) or unknown op"),
        )
        ranked = ranked.withColumn(
            "_rn", F.when(guard.isNull(), F.col("_rn"))
        )
    return ranked.filter(F.col("_rn") == 1).drop("_rn")


def read_cdc_state(
    spark: SparkSession,
    zone_dir: str,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    upsert_op: str = "upsert",
    delete_op: str = "delete",
    strict: bool = True,
) -> DataFrame | None:
    """The zone's current state: one row per live key, change payload
    columns only (``op``/``seq`` dropped)."""
    parts = _read_parts(
        spark,
        os.path.join(zone_dir, CDC_SUBDIR),
        os.path.join(zone_dir, CDC_COMPACT_SUBDIR),
    )
    if parts is None:
        return None
    win = _winners(parts, keys, seq_col, op_col, upsert_op, delete_op, strict)
    return win.filter(F.col(op_col) == upsert_op).drop(op_col, seq_col)


def stream_cdc_zone(
    changes: DataFrame,
    zone_dir: str,
    checkpoint: str,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    upsert_op: str = "upsert",
    delete_op: str = "delete",
    available_now: bool = True,
    compact_every: int | None = 8,
):
    """Start the CDC maintenance query over a STREAMING change frame.
    Returns ``(query, changes_dir)``.  Deltas land per micro-batch;
    every ``compact_every`` batches the readable prefix folds into a
    winners-only snapshot (tombstones dropped — module docstring)."""
    cdc_dir = os.path.join(zone_dir, CDC_SUBDIR)
    compact_dir = os.path.join(zone_dir, CDC_COMPACT_SUBDIR)
    spark = changes.sparkSession
    k = list(keys)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(cdc_dir, f"batch={batch_id}")
        )

        if compact_every and (batch_id + 1) % compact_every == 0 and batch_id > 0:
            parts = _read_parts(spark, cdc_dir, compact_dir, upto=batch_id - 1)
            if parts is not None:
                win = _winners(
                    parts, k, seq_col, op_col, upsert_op, delete_op,
                    strict=False,
                )
                win.filter(F.col(op_col) == upsert_op).write.mode(
                    "overwrite"
                ).parquet(os.path.join(compact_dir, f"upto={batch_id - 1}"))
                for b in _dir_ids(cdc_dir, "batch"):
                    if b <= batch_id - 1:
                        shutil.rmtree(
                            os.path.join(cdc_dir, f"batch={b}"),
                            ignore_errors=True,
                        )
                for u in _dir_ids(compact_dir, "upto"):
                    if u < batch_id - 1:
                        shutil.rmtree(
                            os.path.join(compact_dir, f"upto={u}"),
                            ignore_errors=True,
                        )

    writer = changes.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), cdc_dir
