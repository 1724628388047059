"""Skew diagnosis and mitigation for hot keys at 100 TB.

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in ``session.get_spark``).
These helpers cover the patterns AQE can't fix:

* **finding the hot keys** — :func:`key_skew_stats` (AQE reacts to
  oversized partitions at runtime; capacity planning needs the keys
  and their shares up front);
* a *grouped aggregation* with a mega-key (AQE only splits joins) —
  :func:`salted_agg` two-phases algebraic aggregates so the hot group
  spreads across executors for the partial pass (:func:`two_phase_agg`
  is the original-signature alias);
* a *broadcast-ineligible* join against a table with few huge keys —
  :func:`salted_join` explodes the mid-size side over the salt range
  so the big side's hot key scatters (broadcast stays the answer when
  the small side fits in memory);
* an *all-pairs self-join within a block* (near-dup candidate
  generation) where one dominant block is a single O(n²) join key —
  :func:`triangle_self_join` decomposes each block into a triangle of
  hash-part cells so the pair work distributes (AQE can't split a
  join-key explosion, only oversized shuffle partitions);
* *window functions* — ``Window.partitionBy(hot_key)`` is a single
  task per key, full stop (the repo-wide window-skew rule); the fix is
  restructuring, not salting, but :func:`key_skew_stats` is how the
  hot keys get found.

Salts are DETERMINISTIC (hashes of row content, never ``rand()``), so
results are bit-reproducible across retries and reshuffles; every
operator carries an equivalence pytest against its unsalted twin, and
the plan shapes (salt in the join/agg keys, explode not cartesian) are
asserted with ``explain``.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_skew_stats(
    df: DataFrame, key_cols: Sequence[str], top: int = 20
) -> DataFrame:
    """The ``top`` heaviest key groups with their share of the total:
    ``(key..., n_rows, frac)`` — the diagnosis step before choosing a
    salt factor (rule of thumb: ``n_salts ≈ ceil(frac · n_partitions)``
    for the heaviest key).

    Scale shape: one map-side-combinable count per key, then
    ``orderBy + limit`` — TakeOrderedAndProject (per-partition heaps +
    driver merge), never a global sort or a one-task window."""
    keys = list(key_cols)
    total = df.count()
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        counts.orderBy(F.col("n_rows").desc(), *[F.col(k) for k in keys])
        .limit(top)
        .withColumn(
            "frac", F.round(F.col("n_rows") / F.lit(float(total)), 6)
        )
    )


def _salt_col(
    df: DataFrame, n_salts: int, salt_from: Sequence[str] | None
) -> Column:
    """Deterministic salt in [0, n_salts): hash of the named columns
    (default: every column), so re-runs and reshuffles salt a row the
    same way — no ``rand()``, no RNG state, restart-safe."""
    cols = list(salt_from) if salt_from else list(df.columns)
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast(
        "int"
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join with the hot-key shuffle bounded by construction: the
    BIG side gets a deterministic salt in ``[0, n_salts)``, the SMALL
    side replicates ``n_salts``× (one explode of a literal sequence),
    and the join key becomes ``(on..., _salt)`` — a key holding N rows
    now lands as ``n_salts`` tasks of ~N/n_salts instead of one
    straggler.

    Result ≡ ``big.join(small, on, how)`` for ``inner``/``left`` (the
    supported modes — pytest-pinned): every big row meets exactly the
    one small replica carrying its salt.  Cost: the small side's
    shuffle volume multiplies by ``n_salts`` — which is why the SMALL
    side replicates; if it fits in memory, broadcast it instead and
    skip salting entirely (``F.broadcast``, the repo default for
    dims).  Use this for the mid-size other side: too big to
    broadcast, joined on a skewed key.

    ``salt_from`` names the big-side columns the salt hashes (default
    all of them); pass a unique id column when rows can be full
    duplicates and you want duplicates spread too — identical rows
    salt identically by construction."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            "salted_join supports inner/left joins; an outer join on "
            "the replicated side would fabricate null-extended rows "
            "per replica"
        )
    keys = [on] if isinstance(on, str) else list(on)
    b = big.withColumn("_salt", _salt_col(big, n_salts, salt_from))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return b.join(s, keys + ["_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    n_salts: int = 8,
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for ALGEBRAIC aggregates on a skewed key:
    phase 1 groups by ``(key..., salt)`` (the hot key fans out over
    ``n_salts`` reducers), phase 2 re-folds the ≤ ``n_salts`` partials
    per key.  ``aggs`` maps output name → ``(fn, col)`` with fn in
    sum/count/min/max — the monoids whose partials re-fold exactly
    (count re-folds as SUM of partial counts).

    Result ≡ ``df.groupBy(keys).agg(...)`` (pytest-pinned).  Note
    Spark already runs map-side partial aggregation for these
    functions, which usually IS enough — reach for the explicit salt
    when the per-key STATE is what's oversized (high-cardinality
    secondary grouping, partials that don't shrink) or when a
    downstream op pins the partitioning and defeats partial agg."""
    fold = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for name, (fn, _c) in aggs.items():
        if fn not in fold:
            raise ValueError(
                f"salted_agg supports algebraic aggregates {sorted(fold)}; "
                f"{name!r} uses {fn!r}"
            )
    keys = list(key_cols)
    salted = df.withColumn("_salt", _salt_col(df, n_salts, salt_from))
    p1 = salted.groupBy(*keys, "_salt").agg(
        *[
            getattr(F, fn)(F.col(c)).alias(f"_p_{name}")
            for name, (fn, c) in aggs.items()
        ]
    )
    return p1.groupBy(*keys).agg(
        *[
            getattr(F, fold[fn])(F.col(f"_p_{name}")).alias(name)
            for name, (fn, _c) in aggs.items()
        ]
    )


def two_phase_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    agg_exprs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Original-signature alias for :func:`salted_agg`:
    ``agg_exprs`` maps output column → (input column, fn).  Kept for
    the callers written against the first revision; the engine is the
    deterministic-salt implementation above (the original used a
    seeded ``rand()`` salt — correct, but partitioning-dependent)."""
    return salted_agg(
        df,
        group_cols,
        {name: (fn, col) for name, (col, fn) in agg_exprs.items()},
        n_salts=n_salts,
    )


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
