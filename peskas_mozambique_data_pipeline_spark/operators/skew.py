"""Skew-mitigation utilities for hot keys at 100 TB.

AQE's skew-join splitting handles most cases automatically
(`spark.sql.adaptive.skewJoin.enabled`, on in `session.get_spark`).
These helpers cover the two patterns AQE can't fix:

* a *grouped aggregation* with a mega-key (AQE only splits joins) —
  ``two_phase_agg`` salts the key so the hot group spreads across
  executors for the partial pass;
* a *broadcast-ineligible* join against a table with few huge keys —
  ``salted_join`` explodes the small side over the salt range so the
  big side's hot key scatters.
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
