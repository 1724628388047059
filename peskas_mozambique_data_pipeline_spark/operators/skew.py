"""Skew diagnosis and explicit salting — the hand tools for the hot
keys AQE cannot fix.

AQE's skew-join splitting (on in ``session.py``) handles the common
case: an oversized SHUFFLE PARTITION in a sort-merge join splits into
sub-partitions at runtime.  Three shapes stay hot anyway, and the
operators here address them explicitly:

* **sort-merge join where one side must replicate** — AQE splits the
  big side's oversized partition, but when the matching rows on the
  OTHER side are many (a hot dimension key joined from a fact with
  billions of that key), the split sub-partitions each re-read the
  same other-side rows; an explicit salt bounds every task by
  construction instead of by runtime detection.
* **hash aggregation** — AQE never splits an aggregation key.  A
  ``groupBy(key)`` where one key holds 10% of a 100 TB corpus puts
  10 TB through one reducer regardless of AQE; only map-side partials
  (which Spark already does for algebraic aggs) or an explicit
  two-phase salt bound it when the aggregate state itself is the
  problem (e.g. ``collect_list``-class aggregates, where partials
  don't shrink).
* **window functions** — ``Window.partitionBy(hot_key)`` is a single
  task per key, full stop (the repo-wide "window skew rule"); the fix
  is restructuring (documented per operator), not salting, but
  :func:`key_skew_stats` is how the hot keys get FOUND.

Everything here is deterministic (salts derive from hashes of row
content, never ``rand()``) so results are bit-reproducible and every
operator carries an equivalence pytest against its unsalted twin —
salting changes the PLAN SHAPE only, which the tests assert with
``explain`` (salt column present in the join/agg keys; replication
factor visible as an explode).
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
    salt factor (rule of thumb: ``n_salt ≈ ceil(frac · n_partitions)``
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


def _salt_col(df: DataFrame, n_salt: int, salt_from: Sequence[str] | None) -> Column:
    """Deterministic salt in [0, n_salt): hash of the named columns
    (default: every column), so re-runs and reshuffles salt a row the
    same way — no ``rand()``, no RNG state, restart-safe."""
    cols = list(salt_from) if salt_from else list(df.columns)
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt)).cast(
        "int"
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salt: int = 8,
    how: str = "inner",
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join with the hot-key shuffle bounded by construction: the
    BIG side gets a deterministic salt in ``[0, n_salt)``, the SMALL
    side replicates ``n_salt``× (one explode of a literal sequence),
    and the join key becomes ``(on..., _salt)`` — a key holding N rows
    now lands as ``n_salt`` tasks of ~N/n_salt instead of one straggler.

    Result ≡ ``big.join(small, on, how)`` for ``inner``/``left`` (the
    supported modes — pytest-pinned): every big row meets exactly the
    one small replica carrying its salt.  Cost: the small side's
    shuffle volume multiplies by ``n_salt`` — which is why the SMALL
    side replicates; if the small side fits in memory, broadcast it
    instead and skip salting entirely (``F.broadcast`` — the repo
    default for dims).  Use this for the mid-size other side: too big
    to broadcast, joined on a skewed key.

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
    keys = list(on)
    b = big.withColumn("_salt", _salt_col(big, n_salt, salt_from))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return b.join(s, keys + ["_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    n_salt: int = 8,
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for ALGEBRAIC aggregates on a skewed key:
    phase 1 groups by ``(key..., salt)`` (the hot key fans out over
    ``n_salt`` reducers), phase 2 re-folds the ≤ ``n_salt`` partials
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
    salted = df.withColumn("_salt", _salt_col(df, n_salt, salt_from))
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
