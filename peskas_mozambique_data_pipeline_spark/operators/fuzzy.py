"""Blocked fuzzy-matching operators (SURVEY §2.10 F2-F3).

The reference canonicalizes fisher names by pairwise Levenshtein over
the distinct-name list (R/preprocessing-surveys.R:1316-1374) — an
all-pairs comparison that is fine at its O(10^2) distinct names but is
an N² seed at scale.  Here pair generation is an *equi-join* on a
length block key instead of a cross join:

    edit_distance(a, b) <= k  ⇒  |len(a) - len(b)| <= k

so emitting each left-side name under the 2k+1 keys
``len(a)-k .. len(a)+k`` and keying the right side by its exact length
guarantees every qualifying ordered pair meets on exactly one key
(the right side's single key ``len(b)`` falls in the left side's
window iff the lengths are compatible).  No CartesianProduct /
BroadcastNestedLoopJoin in the plan; candidate volume is bounded by
the length-bucket histogram rather than N².

At 100 TB: the join shuffles on the block key; a degenerate corpus
where every string has the same length still pairs within that bucket
(inherent to edit-distance blocking — add a domain blocking key such
as region or first-token upstream if the data allows), but the plan
never materializes a cartesian and AQE can split oversized buckets'
post-join filter work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    names: DataFrame,
    col: str = "name",
    max_dist: int = 2,
    out_left: str = "name",
    out_right: str = "cand",
) -> DataFrame:
    """All ordered pairs (a, b) from ``names`` with
    ``levenshtein(a, b) <= max_dist``, including the self pair (a, a),
    generated via a length-block equi-join (never a cross join).

    The threshold form ``levenshtein(a, b, k)`` runs the banded
    O(k·n) algorithm and early-exits, returning -1 past the band —
    ``between(0, k)`` keeps true matches only.

    Join shape (r14): ``names`` is a distinct-name dim (small by
    construction), so the length-block join runs as a BROADCAST hash
    join with the probe side spread round-robin first.  The former
    shuffle equi-join on ``_blk`` funneled every pair of a dominant
    length class through ONE task (uniform-length name schemes like
    ``Supplier#NNNNNNNNN`` have a single hot block; AQE skew-join
    cannot split a single key below its 256 MB threshold) — measured
    2.8 s of single-core levenshtein at sf0.1, 0.35 s spread.
    Parallelism now comes from the probe side's partitioning, which
    round-robin distributes regardless of length skew.
    """
    left = names.repartition(
        names.sparkSession.sparkContext.defaultParallelism
    ).select(
        F.col(col).alias(out_left),
        F.explode(
            F.sequence(
                F.length(col) - F.lit(max_dist), F.length(col) + F.lit(max_dist)
            )
        ).alias("_blk"),
    )
    right = names.select(
        F.col(col).alias(out_right), F.length(col).alias("_blk")
    )
    return (
        left.join(F.broadcast(right), "_blk")
        .drop("_blk")
        .filter(
            F.levenshtein(F.col(out_left), F.col(out_right), max_dist).between(0, max_dist)
        )
    )


def canonicalize_names(
    pairs: DataFrame,
    left: str = "name",
    right: str = "cand",
    out: str = "canonical",
) -> DataFrame:
    """Single-hop canonicalization (F3): each name maps to the
    (shortest, alphabetically first) variant in its neighborhood —
    the reference's one-pass rule, not a transitive closure
    (R/preprocessing-surveys.R:1340-1360)."""
    w = Window.partitionBy(left).orderBy(F.length(right), F.col(right))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(left, F.col(right).alias(out))
    )
