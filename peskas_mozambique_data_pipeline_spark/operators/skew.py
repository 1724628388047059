"""Skew-mitigation utilities for hot keys at 100 TB.

AQE's skew-join splitting handles most cases automatically
(`spark.sql.adaptive.skewJoin.enabled`, on in `session.get_spark`).
These helpers cover the two patterns AQE can't fix:

* a *grouped aggregation* with a mega-key (AQE only splits joins) —
  ``two_phase_agg`` salts the key so the hot group spreads across
  executors for the partial pass;
* a *broadcast-ineligible* join against a table with few huge keys —
  ``salted_join`` explodes the small side over the salt range so the
  big side's hot key scatters;
* an *all-pairs self-join within a block* (near-dup candidate
  generation) where one dominant block is a single O(n²) join key —
  ``triangle_self_join`` decomposes each block into a triangle of
  hash-part cells so the pair work distributes (AQE can't split a
  join-key explosion, only oversized shuffle partitions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def two_phase_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    agg_exprs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Salted two-phase aggregation for skewed group keys.

    ``agg_exprs`` maps output column → (input column, fn) where fn is
    'sum' or 'count'.  Phase 1 aggregates on (key, salt) — the hot key's
    rows split across ``n_salts`` reducers; phase 2 combines the (at
    most n_salts × n_keys) partials.  Only algebraic aggregates compose
    this way, which is why the surface is restricted.
    """
    gcols = list(group_cols)
    salted = df.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    phase1 = []
    for out, (col, fn) in agg_exprs.items():
        if fn == "sum":
            phase1.append(F.sum(col).alias(out))
        elif fn == "count":
            phase1.append(F.count(col).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    partial = salted.groupBy(*gcols, "_salt").agg(*phase1)
    phase2 = [
        (F.sum(out) if fn in ("sum", "count") else F.first(out)).alias(out)
        for out, (_, fn) in agg_exprs.items()
    ]
    return partial.groupBy(*gcols).agg(*phase2)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed join: salt the big side, explode the small side.

    The big side gets a random salt in [0, n_salts); the small side is
    replicated once per salt value, so the join key becomes
    (key, salt) and the big side's hot key spreads over ``n_salts``
    partitions.  Small-side cost: |small| × n_salts rows — keep
    ``small`` genuinely small.
    """
    big_s = big.withColumn("_salt", (F.rand(seed=11) * n_salts).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")


def triangle_self_join(
    df: DataFrame,
    block_cols: Sequence[str],
    id_col: str,
    n_parts: int = 8,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """All unordered within-block pairs as a *distributable* equi-join.

    The naive candidate generator ``a.join(b, block).filter(id_a <
    id_b)`` puts every pair of a block on ONE join key — a dominant
    block degenerates to O(n²) work in a single task, and AQE cannot
    split it (it is a join-row explosion, not an oversized shuffle
    partition).  This decomposition hashes each row to a part
    ``p = pmod(xxhash64(id), n_parts)`` and enumerates the triangle of
    part cells: the left row covers cells ``(p, j)`` for ``j >= p``,
    the right row covers ``(i, p)`` for ``i <= p``, and the join key is
    ``(block, cell_i, cell_j)``.  Every unordered pair meets in exactly
    one cell when its parts differ (orientation: part(left) <=
    part(right)), and in both orientations on the diagonal, where the
    ``id_a < id_b`` filter keeps one.  A hot block becomes
    ``n_parts·(n_parts+1)/2`` independent cells of ~``(n/n_parts)²``
    pairs each.

    Row replication cost: each input row is emitted ``n_parts + 1``
    times; pair-comparison total is unchanged — this buys parallelism,
    not fewer comparisons (use an LSH/blocking key upstream for that).

    Off-diagonal pairs keep the part orientation, so ``id{suffix_a}``
    is NOT guaranteed < ``id{suffix_b}`` — normalize downstream with
    least/greatest if a canonical order matters.
    """
    sa, sb = suffixes
    payload = [c for c in df.columns if c not in set(block_cols)]
    base = df.withColumn(
        "_part", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_parts)).cast("int")
    )
    left = base.select(
        *block_cols,
        *[F.col(c).alias(c + sa) for c in payload],
        F.col("_part").alias("_cell_i"),
        F.explode(F.sequence(F.col("_part"), F.lit(n_parts - 1))).alias("_cell_j"),
    )
    right = base.select(
        *block_cols,
        *[F.col(c).alias(c + sb) for c in payload],
        F.explode(F.sequence(F.lit(0), F.col("_part"))).alias("_cell_i"),
        F.col("_part").alias("_cell_j"),
    )
    pairs = left.join(right, [*block_cols, "_cell_i", "_cell_j"])
    return pairs.filter(
        (F.col("_cell_i") != F.col("_cell_j"))
        | (F.col(id_col + sa) < F.col(id_col + sb))
    ).drop("_cell_i", "_cell_j")
