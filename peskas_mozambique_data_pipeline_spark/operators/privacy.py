"""Re-identification-risk audits and generalization primitives for
training-data release: k-anonymity, l-diversity, rare-group
suppression, and quasi-identifier coarsening.

A corpus row is re-identifiable when its quasi-identifier (QI)
combination — the columns an adversary can link from the outside —
is shared by too few rows.  The classic release gates (Sweeney's
k-anonymity; Machanavajjhala's l-diversity for the sensitive column
within each QI class) are pure relational algebra, so they run as
plain grouped aggregates the optimizer can push around:

* :func:`k_anonymity_report` — one groupBy over the QI columns, one
  tiny summary: minimum class size (= the dataset's k), how many
  classes/rows sit under the threshold.
* :func:`risky_groups` — the offending QI classes themselves
  (size < k), for triage.
* :func:`l_diversity_report` — per-class distinct count of the
  sensitive column via one two-level aggregate (exact, not a sketch:
  the verdict gates a release).
* :func:`suppress_rare_groups` — the enforcement half: drop rows in
  QI classes smaller than k.  One aggregate + one equi-join on the
  QI key (NULL-safe, so NULL QI values form their own class exactly
  as groupBy does).
* :func:`generalize` — declarative QI coarsening (numeric binning,
  string prefix, date truncation) as a single projection; re-audit
  after generalizing is the standard anonymization loop.

Scale shape: everything is one shuffle on the QI key.  The class-size
frame has QI-class cardinality (far below row count); the summary is
one row.  ``suppress_rare_groups`` joins class sizes back on the QI
key — the same shuffle partitioning as the aggregate that produced
them, so AQE reuses the exchange; no window over row-grain data, no
driver collect.  NULL handling is pinned: NULL QI values group
together (a NULL zip code is itself a linkable fact), and the join
back is null-safe so those rows are suppressed or kept by their own
class size, never dropped by join semantics.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def class_sizes(df: DataFrame, qi_cols: Sequence[str]) -> DataFrame:
    """One row per QI equivalence class: ``(qi..., class_size)``."""
    return df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("class_size"))


def k_anonymity_report(
    df: DataFrame, qi_cols: Sequence[str], k: int
) -> DataFrame:
    """One-row release gate: ``(k_threshold, n_rows, n_classes,
    min_class_size, n_risky_classes, n_risky_rows)`` — the dataset is
    k-anonymous iff ``min_class_size >= k`` (empty input reports
    zeros, not NULLs)."""
    sizes = class_sizes(df, qi_cols)
    risky = F.col("class_size") < F.lit(k)
    return sizes.agg(
        F.lit(int(k)).alias("k_threshold"),
        F.coalesce(F.sum("class_size"), F.lit(0)).alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.coalesce(F.min("class_size"), F.lit(0)).alias("min_class_size"),
        F.coalesce(
            F.sum(risky.cast("long")), F.lit(0)
        ).alias("n_risky_classes"),
        F.coalesce(
            F.sum(F.when(risky, F.col("class_size")).otherwise(F.lit(0))),
            F.lit(0),
        ).alias("n_risky_rows"),
    )


def risky_groups(
    df: DataFrame, qi_cols: Sequence[str], k: int
) -> DataFrame:
    """The QI classes violating k-anonymity (size < k), for triage."""
    return class_sizes(df, qi_cols).filter(F.col("class_size") < F.lit(k))


def l_diversity_report(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    l_threshold: int,
) -> DataFrame:
    """Per-QI-class distinct sensitive values; classes with
    ``diversity < l`` are vulnerable to homogeneity attacks even when
    k-anonymous.  Returns ``(qi..., class_size, diversity, diverse)``.
    NULL sensitive values do not count toward diversity (countDistinct
    semantics — an absent diagnosis is not a revealed one)."""
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct(sensitive_col).alias("diversity"),
    ).withColumn(
        "diverse", F.col("diversity") >= F.lit(l_threshold)
    )


def suppress_rare_groups(
    df: DataFrame, qi_cols: Sequence[str], k: int
) -> DataFrame:
    """Drop every row whose QI class has fewer than ``k`` members —
    the suppression step of a k-anonymization pass.  NULL-safe join on
    the QI key so NULL-valued classes are judged by their own size."""
    qi = list(qi_cols)
    keep = class_sizes(df, qi).filter(
        F.col("class_size") >= F.lit(k)
    ).drop("class_size")
    cond = [df[c].eqNullSafe(keep[c]) for c in qi]
    return df.join(keep, cond, "left_semi")


def generalize(
    df: DataFrame, spec: Mapping[str, tuple[str, object]]
) -> DataFrame:
    """Coarsen QI columns in one projection.  ``spec`` maps a column
    to a (kind, param) pair:

    * ``("bin", width)`` — numeric → ``floor(x / width) * width``
      (the bin's lower edge, same type family);
    * ``("prefix", n)`` — string → first ``n`` characters;
    * ``("date_trunc", unit)`` — date/timestamp → ``F.date_trunc``
      unit (``"year"``, ``"month"``, ``"week"``...), cast back to
      date.

    NULLs pass through untouched (a NULL generalizes to NULL)."""
    out = df
    for col, (kind, param) in spec.items():
        c = F.col(col)
        if kind == "bin":
            g: Column = F.floor(c / F.lit(param)) * F.lit(param)
        elif kind == "prefix":
            g = F.substring(c, 1, int(param))
        elif kind == "date_trunc":
            g = F.date_trunc(str(param), c).cast("date")
        else:
            raise ValueError(f"unknown generalization kind: {kind!r}")
        out = out.withColumn(col, g)
    return out
