"""MERGE / SCD2 emulation for the curated zones.

The reference's cloud zones are immutable versioned snapshots
(R/ingestion.R upload_parquet_to_cloud + "latest" resolution); updates
arrive as whole re-pulls.  At 100 TB a full rewrite per pull is the
wrong plan — these operators give the two incremental shapes Spark
lacks as built-ins on plain parquet:

* ``merge_upsert`` — MERGE semantics (update matched, insert new,
  keep untouched) as anti-join + unionByName.  One shuffle on the key
  (or zero with pre-bucketed zones); the source side is typically the
  small delta and broadcastable.
* ``scd2_from_events`` — build type-2 dimension versions (valid_from /
  valid_to / is_current) from an event stream with lag/lead windows;
  consecutive duplicates collapse so only genuine attribute changes
  open a new version.

Both are pure DataFrame compositions — no Python in the loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """MERGE: source rows win on key match, unmatched target rows are
    kept, source-only rows insert.  Schemas must be union-compatible
    by name (``allowMissingColumns`` fills NULLs so the delta may omit
    untouched columns).

    Scale: the anti join shuffles both sides on ``keys`` once; when the
    delta is small Spark broadcasts it and the target never shuffles.
    """
    kept = target.join(source.select(*keys), list(keys), "left_anti")
    return kept.unionByName(source, allowMissingColumns=True)


def scd2_from_events(
    events: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Type-2 dimension from an event stream: one row per (key, version)
    with ``valid_from`` / ``valid_to`` / ``is_current``.

    A version opens where the tracked attribute differs from the
    previous event of the same key (consecutive duplicates collapse);
    it closes at the next version's ``valid_from``; the open version has
    NULL ``valid_to``.  ``tiebreak`` makes same-timestamp ordering
    deterministic (required for cross-engine parity).

    Scale: two window passes over the same (key × time) sort — Spark
    reuses the partitioning/sort between them, so one shuffle total.
    """
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    # lag a struct wrapper: NULL means "no previous row" even when the
    # attribute itself is NULL, so a NULL-valued attribute still
    # collapses consecutive duplicates (null-safe comparison)
    changes = (
        events.withColumn("_prev", F.lag(F.struct(F.col(attr).alias("v"))).over(w))
        .filter(
            F.col("_prev").isNull()
            | ~F.col(attr).eqNullSafe(F.col("_prev").getField("v"))
        )
        .drop("_prev")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        changes.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key, attr, "valid_from", "valid_to", "is_current")
    )


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    upsert_op: str = "upsert",
    delete_op: str = "delete",
    strict: bool = True,
) -> DataFrame:
    """Apply an ORDERED change stream (CDC) to a snapshot: per key the
    highest-``seq_col`` change wins — an ``upsert_op`` row replaces or
    inserts the key with the change's payload, a ``delete_op`` row
    removes it; earlier changes for the same key are superseded
    without ever touching the target (the Debezium/Delta "apply
    changes" shape on plain immutable zones).

    Determinism contract: ``(keys, seq)`` must be UNIQUE in
    ``changes`` — two changes to one key carrying the same sequence
    number have no defined winner.  ``strict=True`` (default) folds an
    assert into the winner selection, so a violating batch FAILS the
    job instead of silently picking a partition-dependent row; pass
    ``strict=False`` only when uniqueness is already enforced
    upstream.  Unknown ``op`` values always raise via the same guard.

    Scale shape: the winner-per-key window runs on the CHANGES frame
    only (delta-sized, per-key partitions — parallel across keys, and
    the target is never windowed); application is ONE anti-join of the
    target against the touched keys (broadcastable when the delta is
    small) plus a unionByName of the surviving upserts.  Deleting a
    key absent from the target is a no-op by construction.  Change
    payloads may omit untouched columns (allowMissingColumns fills
    NULLs — column-level merge needs the old row and is
    ``merge_upsert`` + a coalesce projection, not CDC apply).
    """
    k = list(keys)
    w = Window.partitionBy(*k).orderBy(F.col(seq_col).desc())
    ranked = changes.withColumn("_rn", F.row_number().over(w))
    if strict:
        dup = F.count(F.lit(1)).over(
            Window.partitionBy(*k, seq_col)
        )
        guard = F.assert_true(
            (dup == 1)
            & F.col(op_col).isin(upsert_op, delete_op),
            F.lit(
                "apply_cdc: duplicate (key, seq) or unknown op in changes"
            ),
        )
        # fold the assert into a kept expression so Catalyst can't
        # prune it (the bloom_probe lesson)
        ranked = ranked.withColumn(
            "_rn", F.when(guard.isNull(), F.col("_rn"))
        )
    latest = ranked.filter(F.col("_rn") == 1).drop("_rn")
    kept = target.join(latest.select(*k), k, "left_anti")
    upserts = (
        latest.filter(F.col(op_col) == upsert_op)
        .drop(op_col, seq_col)
    )
    return kept.unionByName(upserts, allowMissingColumns=True)
