"""Declarative data-quality expectations over a zone — the reference's
per-rule validation flags (R/validation.R's alert battery) generalized
into a reusable contract: declare rules once, get the violation report,
the per-row annotation, and the quarantine split from the same
definitions.

Three evaluation shapes, chosen by what the rule needs:

* **row-local rules** (:func:`expect`) — not-null, range, regex, set
  membership, cross-column predicates: ANY boolean ``Column``.  All of
  them evaluate in ONE scan: :func:`check` folds every rule into a
  single aggregate pass (map-side combinable sums of ``when`` flags),
  and :func:`annotate` builds the per-row failed-rule array inside one
  projection — no per-rule scans, no shuffle beyond the one aggregate.
* **uniqueness** (:func:`expect_unique`) — needs a groupBy on the key
  (one shuffle); reported as the number of rows carrying a duplicated
  key.
* **referential integrity** (:func:`expect_in_dim`) — needs an
  anti-join against the dimension (broadcast when the dim is small,
  which dims are).

The report schema is fixed — ``(rule, kind, n_violations, n_rows,
frac)`` — so reports from different zones/runs union and trend (land
them in a versioned zone next to the data they describe).

Determinism: rules are pure Column expressions; the report is a pure
aggregate of them.  Rows where a rule's predicate evaluates NULL count
as VIOLATIONS (the SQL three-valued trap: ``price > 0`` on a NULL
price is NULL, and a null price is not a passing price) — rule authors
who want null-tolerance say so explicitly (``col.isNull() | (col >
0)``).  This is pytest-pinned.

At 100 TB: row-local checks ride whatever scan already reads the zone
(one extra aggregate), uniqueness is one exchange on the key, and the
quarantine split re-uses the annotated projection — two writes, one
source scan (Spark materializes the scan per action; checkpoint the
annotated frame first if the upstream is expensive).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named row-local expectation: ``predicate`` True = pass.
    NULL predicate results count as violations (module docstring)."""

    name: str
    predicate: Column


def expect(name: str, predicate: Column) -> Rule:
    return Rule(name, predicate)


def _fails(rule: Rule) -> Column:
    # NULL-safe: a NULL predicate is a violation
    return ~F.coalesce(rule.predicate, F.lit(False))


def check(
    df: DataFrame,
    rules: Sequence[Rule],
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Violation report for row-local rules in ONE aggregate scan:
    ``(group..., rule, kind, n_violations, n_rows, frac)`` — one row
    per rule (× group when ``group_cols`` is given; per-group counts
    SUM-fold across slices/batches, which is what the streaming DQ
    ledger exploits)."""
    if not rules:
        raise ValueError("check needs at least one rule")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    g = list(group_cols)
    # coalesce: SUM over zero rows is NULL — an empty (global) input
    # must report 0 violations, not leak NULL into the fixed report
    # schema / the DQ ledger's sum-fold (ADVICE r13)
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.coalesce(F.sum(_fails(r).cast("long")), F.lit(0)).alias(f"_v_{i}")
        for i, r in enumerate(rules)
    ]
    row = df.groupBy(*g).agg(*aggs) if g else df.agg(*aggs)
    # unpivot the ONE aggregate row by exploding a rule-name/count
    # struct array — a per-rule union of projections would re-execute
    # the aggregate (and its scan) once per rule
    pairs = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col(f"_v_{i}").alias("n_violations"),
            )
            for i, r in enumerate(rules)
        ]
    )
    out = row.select(
        *g, F.explode(pairs).alias("_p"), F.col("_n").alias("n_rows")
    ).select(
        *g,
        F.col("_p.rule").alias("rule"),
        F.lit("row").alias("kind"),
        F.col("_p.n_violations").alias("n_violations"),
        "n_rows",
    )
    return out.withColumn(
        "frac",
        F.when(
            F.col("n_rows") > 0,
            F.round(F.col("n_violations") / F.col("n_rows"), 6),
        ).otherwise(F.lit(0.0)),
    )


def annotate(
    df: DataFrame, rules: Sequence[Rule], out_col: str = "violations"
) -> DataFrame:
    """Adds ``out_col``: the array of failed rule names per row (empty
    array = clean).  One projection — codegen, no shuffle."""
    arr = F.array_compact(
        F.array(
            *[
                F.when(_fails(r), F.lit(r.name)) for r in rules
            ]
        )
    )
    return df.withColumn(out_col, arr)


def quarantine_split(
    df: DataFrame, rules: Sequence[Rule], out_col: str = "violations"
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): rows failing ANY rule land in quarantine
    WITH their failed-rule array (the actionable half — a quarantine
    you can't explain is a dead-letter queue).  Both sides share the
    annotated projection; checkpoint it first if the upstream plan is
    expensive (two actions = two plan executions otherwise)."""
    ann = annotate(df, rules, out_col)
    clean = ann.filter(F.size(out_col) == 0).drop(out_col)
    bad = ann.filter(F.size(out_col) > 0)
    return clean, bad


def expect_unique(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Uniqueness report row: n_violations = rows whose key occurs
    more than once (all copies count — deduping must touch them all).
    One groupBy shuffle on the key."""
    keys = list(key_cols)
    dup_rows = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") > 1)
        .agg(F.coalesce(F.sum("_c"), F.lit(0)).alias("n_violations"))
    )
    total = df.agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        dup_rows.crossJoin(total)
        .select(
            F.lit("unique(" + ",".join(keys) + ")").alias("rule"),
            F.lit("unique").alias("kind"),
            "n_violations",
            "n_rows",
            F.when(
                F.col("n_rows") > 0,
                F.round(F.col("n_violations") / F.col("n_rows"), 6),
            ).otherwise(F.lit(0.0)).alias("frac"),
        )
    )


def expect_in_dim(
    df: DataFrame,
    col: str,
    dim: DataFrame,
    dim_col: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Referential-integrity report row: n_violations = rows whose
    ``col`` has no match in ``dim.dim_col`` (NULLs violate — an
    unjoinable key is unjoinable).  One anti-join; the dim broadcasts
    by default (dims are small — pass False for a mid-size dim and
    let AQE pick)."""
    keys = dim.select(F.col(dim_col).alias("__k")).distinct()
    if broadcast_dim:
        keys = F.broadcast(keys)
    missing = df.join(
        keys, F.col(col).eqNullSafe(F.col("__k")), "left_anti"
    ).agg(F.count(F.lit(1)).alias("n_violations"))
    total = df.agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        missing.crossJoin(total)
        .select(
            F.lit(f"in_dim({col})").alias("rule"),
            F.lit("referential").alias("kind"),
            "n_violations",
            "n_rows",
            F.when(
                F.col("n_rows") > 0,
                F.round(F.col("n_violations") / F.col("n_rows"), 6),
            ).otherwise(F.lit(0.0)).alias("frac"),
        )
    )


def full_report(
    df: DataFrame,
    rules: Sequence[Rule] = (),
    unique_keys: Sequence[Sequence[str]] = (),
    dims: Sequence[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Union of every requested check, one fixed-schema report frame:
    row-local rules (one scan), uniqueness keys (one shuffle each),
    referential dims (one broadcast anti-join each)."""
    parts: list[DataFrame] = []
    if rules:
        parts.append(check(df, rules))
    for keys in unique_keys:
        parts.append(expect_unique(df, keys))
    for col, dim, dim_col in dims:
        parts.append(expect_in_dim(df, col, dim, dim_col))
    if not parts:
        raise ValueError("full_report needs at least one check")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
