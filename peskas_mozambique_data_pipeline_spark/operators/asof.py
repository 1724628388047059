"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` sharing the key.  The reference's trip merge
(J5, R/merge-trips.R) is the degenerate date-equality flavor; this is
the general OLAP pattern (price as of trade time, sensor state as of
reading).

Implementation is a pure composition of built-in ops (preference (1) of
the custom-operator ladder): tag both sides, union them, and run one
``last(..., ignorenulls=True)`` window over (key, time) so every left
row sees the latest preceding right attributes.  Cost: a single shuffle
on the key + one within-partition sort — the same complexity class as
``pd.merge_asof`` done distributed, with no Python in the loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    right_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Left as-of join: latest ``right`` row with ``on`` ≤ left's ``on``
    per ``by`` key.  ``right_cols`` are the columns carried from the
    right side (default: all non-key, non-time columns).

    At equal timestamps the right row IS visible to the left row
    (``<=`` semantics, matching DuckDB's ASOF JOIN).
    """
    by_keys = [by] if isinstance(by, str) else list(by)
    right_cols = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in {*by_keys, on}]
    )
    overlap = [c for c in right_cols if c in left.columns]
    if overlap:
        raise ValueError(f"right_cols {overlap} collide with left columns; rename first")

    l_tag = left.select(
        *by_keys,
        F.col(on),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    r_tag = right.select(
        *by_keys,
        F.col(on),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in right_cols],
        F.lit(None)
        .cast(l_tag.schema["_lrow"].dataType)
        .alias("_lrow"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows (side 0) sort before left rows at the same timestamp so
    # <= semantics hold; one shuffle on `by`, one sort on (ts, side).
    # right_cols in the ordering make the pick deterministic when the
    # right side has duplicate (key, ts) rows (last = max by columns).
    w = (
        Window.partitionBy(*by_keys)
        .orderBy(F.col(on).asc(), F.col("_side").asc(), *[F.col(c).asc_nulls_first() for c in right_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Carry ALL right columns as one struct so every attribute comes from
    # the SAME right row (per-column last(ignorenulls) would mix columns
    # from different rows when the latest right row has NULL attributes —
    # that would diverge from DuckDB/pandas ASOF semantics).
    r_row = F.when(
        F.col("_side") == 0, F.struct(*[F.col(c) for c in right_cols])
    )
    filled = unioned.select(
        "*",
        F.last(r_row, ignorenulls=True).over(w).alias("_asof"),
    )
    out = filled.filter(F.col("_side") == 1).select(
        F.col("_lrow.*"),
        *[F.col(f"_asof.{c}").alias(c) for c in right_cols],
    )
    return out
