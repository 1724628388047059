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
