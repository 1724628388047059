"""Join operators (SURVEY §2.3).

Design stance for scale: dimension sides are always broadcast (J1, J10);
the N-ary full merge (J2) reuses one hash-partitioning on the key across
all merge steps; the conditional 1:1 merge (J5) computes both gatekeeper
windows in one shuffle per side.
"""

from __future__ import annotations

from functools import reduce
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def enrich(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Sequence[str] | str]],
    how: str = "left",
) -> DataFrame:
    """Star-schema enrichment chain (J1): chained left joins to small
    lookup tables (R/preprocessing-surveys.R:974-1016 joins taxa, gear,
    vessels, sites, geo in sequence).

    Every dim is broadcast-hinted: on a 1000-executor cluster these are
    map-side hash joins with zero shuffle of the fact table.
    """
    out = fact
    for dim, on in dims:
        out = out.join(F.broadcast(dim), on=on, how=how)
    return out


def nary_full_join(dfs: Sequence[DataFrame], on: str | Sequence[str]) -> DataFrame:
    """N-ary full outer merge by key (J2): ``purrr::reduce(list(...),
    full_join, by='submission_id')`` (R/preprocessing-surveys.R:286-293).

    With AQE the chain of full joins on the same key reuses the exchange
    — each input shuffles once on ``on`` and subsequent joins are
    co-partitioned.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return reduce(lambda a, b: a.join(b, keys, "full"), dfs)


def natural_left_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """Left join on all shared columns (J4): dplyr ``left_join`` without
    ``by`` (R/validation.R:279-281,737-739).

    The reference infers keys silently; here the shared-column list is
    computed explicitly so schema drift is visible in the plan.
    """
    shared = [c for c in left.columns if c in set(right.columns)]
    if not shared:
        raise ValueError("natural_left_join: no shared columns")
    return left.join(right, shared, "left")


def semi_join(
    df: DataFrame,
    keys_df: DataFrame,
    on: str | Sequence[str],
    broadcast_keys: bool = True,
) -> DataFrame:
    """Keep rows whose key appears in ``keys_df`` (J6):
    ``filter(id %in% ids)`` (R/validation.R:315-317).

    ``broadcast_keys=False`` drops the hint for key sets whose
    cardinality is data-dependent (AQE then broadcasts only when the
    runtime size actually fits)."""
    on = [on] if isinstance(on, str) else list(on)
    keys = keys_df.select(*on).distinct()
    if broadcast_keys:
        keys = F.broadcast(keys)
    return df.join(keys, on, "left_semi")


def anti_join(
    df: DataFrame,
    keys_df: DataFrame,
    on: str | Sequence[str],
    broadcast_keys: bool = True,
) -> DataFrame:
    """Drop rows whose key appears in ``keys_df`` (J7): flagged-id
    exclusion (R/validation.R:432-440,879-887).  ``broadcast_keys`` as
    in :func:`semi_join`."""
    on = [on] if isinstance(on, str) else list(on)
    keys = keys_df.select(*on).distinct()
    if broadcast_keys:
        keys = F.broadcast(keys)
    return df.join(keys, on, "left_anti")


def upsert_split(
    incoming: DataFrame, existing_keys: DataFrame, on: str | Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """Split rows into (update, create) sets by key existence (J8):
    R/airtable.R:373-387."""
    return semi_join(incoming, existing_keys, on), anti_join(incoming, existing_keys, on)


def conditional_one_to_one_merge(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Conditional 1:1 full merge (J5): join GPS trips ↔ survey landings
    on (landing_date, imei) ONLY for key-days with exactly one row on
    EACH side; multi-row key-days pass through unjoined
    (R/merge-trips.R:42-73).

    Implementation: per-side window ``count(*) over (partition by keys)``
    gates the joinable subset; the remainder is unioned back with
    ``allowMissingColumns`` (ragged U1 semantics).  Each side shuffles
    once on the join key; the window and the join share that
    partitioning.
    """
    keys = list(on)
    w = Window.partitionBy(*keys)

    lt = left.withColumn("_n", F.count(F.lit(1)).over(w))
    rt = right.withColumn("_n", F.count(F.lit(1)).over(w))

    l_one, l_rest = lt.filter(F.col("_n") == 1).drop("_n"), lt.filter(F.col("_n") > 1).drop("_n")
    r_one, r_rest = rt.filter(F.col("_n") == 1).drop("_n"), rt.filter(F.col("_n") > 1).drop("_n")

    merged = l_one.join(r_one, keys, "full")
    out = merged.unionByName(l_rest, allowMissingColumns=True)
    return out.unionByName(r_rest, allowMissingColumns=True)


def except_keys(df: DataFrame, remove: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Set difference on keys (U2): ``setdiff(flagged, approved)``
    (R/validation.R:1035-1040)."""
    return anti_join(df, remove, on)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bin_seconds: int = 21600,
) -> DataFrame:
    """Bucketized interval (range) join — an operator Spark's planner
    has no native strategy for: each point row matches every interval
    row with ``start <= point <= end`` (and equal ``by`` keys).  The
    naive expression is a non-equi theta join, which Spark plans as a
    broadcast nested loop or cartesian product — quadratic.

    Bucketization makes it an EQUI join: time is cut into fixed
    ``bin_seconds`` bins; every interval replicates to each bin it
    overlaps (``sequence(floor(start/b), floor(end/b))`` — explode), a
    point lands in exactly ONE bin, and the join runs on
    (``by…``, bin) with the exact range predicate as a residual
    filter.  Because the point side maps to a single bin and an
    interval appears at most once per bin, each qualifying pair is
    emitted exactly once — no dedup pass.

    Scale shape: the only shuffle is the (by, bin) equi-join; interval
    replication is ceil(duration / bin_seconds) + 1 copies, so
    ``bin_seconds`` dials replication against join selectivity — set
    it near the typical interval duration (replication ≈ 2) unless
    intervals are wildly skewed, in which case a smaller bin turns one
    hot bin into many splittable ones (AQE skew-join handles the
    rest).  Timestamps compare at full precision in the residual;
    binning only needs second resolution.
    """
    keys = list(by)
    overlap = set(points.columns) & set(intervals.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"columns {sorted(overlap)} exist on both sides; rename first"
        )
    b = F.lit(bin_seconds)
    pt = points.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(point_col)) / b)
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b),
                F.floor(F.unix_timestamp(F.col(end_col)) / b),
            )
        ),
    )
    return (
        pt.join(iv, [*keys, "_bin"])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bin")
    )
