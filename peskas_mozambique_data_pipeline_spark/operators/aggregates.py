"""Aggregation operators (SURVEY §2.4), including the project's one
genuinely custom aggregate: robust MAD-based outlier bounds (A7).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# LocScaleB scales the MAD to a robust sd estimate with the standard
# consistency constant (univOutl::LocScaleB, used at
# R/validation-functions.R:43-69,108-132).
MAD_TO_SD = 1.4826


def exact_median(col: str | Column) -> Column:
    """Exact median aggregate (A3).  Spark's ``percentile`` uses the same
    linear interpolation as R type-7 quantiles — never use
    ``percentile_approx`` where results feed an equality oracle
    (SURVEY §4 note 2)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile(c, F.lit(0.5))


def exact_quantile(col: str | Column, q: float) -> Column:
    """Exact quantile aggregate (A6): R ``quantile(x, q)`` type-7
    (R/model-taxa.R:190-196,204-213)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile(c, F.lit(q))


def robust_bounds(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: float = 3.0,
    log_transform: bool = True,
) -> DataFrame:
    """Per-group robust location-scale outlier bounds (A7).

    Re-implements the observed call surface of ``univOutl::LocScaleB``
    (R/validation-functions.R:43-69,108-132,242-274,375-401): on the
    (optionally log) scale compute median and MAD, scale MAD to a robust
    sd (×1.4826), bound = median ± k·sd, then back-transform with exp.
    Groups whose MAD is 0 or whose values are all NULL/≤0 yield NULL
    bounds (the reference skips those groups).

    Physical plan (r15, guide §2.4): the projected fact is explicitly
    hash-partitioned on ``group_cols`` ONCE; both percentile
    aggregations (median, then MAD) and the broadcast join-back all
    land on that single exchange — the former shape re-derived the
    scan+join+log projection per aggregation (two full fact scans) and
    exchanged it twice.  ReuseExchange dedupes the repartition subtree
    across the median branch and the deviation branch, so the fact is
    scanned once and shuffled once.  No applyInPandas, no per-group
    Python.

    Returns one row per group: ``group_cols + [lower_bound, upper_bound]``.
    """
    gcols = list(group_cols)
    v = F.col(value_col)
    x = F.when(v > 0, F.log(v)) if log_transform else v

    scaled = (
        df.select(*gcols, x.alias("_x"))
        .filter(F.col("_x").isNotNull())
        .repartition(*[F.col(g) for g in gcols])
    )

    med = scaled.groupBy(*gcols).agg(F.percentile(F.col("_x"), F.lit(0.5)).alias("_med"))
    dev = scaled.join(F.broadcast(med), gcols)
    stats = dev.groupBy(*gcols).agg(
        F.first("_med").alias("_med"),
        F.percentile(F.abs(F.col("_x") - F.col("_med")), F.lit(0.5)).alias("_mad"),
    )

    sd = F.col("_mad") * F.lit(MAD_TO_SD)
    lo = F.col("_med") - F.lit(k) * sd
    hi = F.col("_med") + F.lit(k) * sd
    if log_transform:
        lo, hi = F.exp(lo), F.exp(hi)
    guard = F.col("_mad") > 0
    return stats.select(
        *gcols,
        F.when(guard, lo).alias("lower_bound"),
        F.when(guard, hi).alias("upper_bound"),
    )


def flag_outliers(
    df: DataFrame,
    bounds: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    flag_col: str = "outlier_flag",
    flag_value: str = "outlier",
) -> DataFrame:
    """Join per-group bounds back and flag out-of-range rows (J10):
    R/validation-functions.R:180-201,327-344,444-461."""
    gcols = list(group_cols)
    out = df.join(F.broadcast(bounds), gcols, "left")
    v = F.col(value_col)
    is_out = (
        v.isNotNull()
        & F.col("upper_bound").isNotNull()
        & ((v < F.col("lower_bound")) | (v > F.col("upper_bound")))
    )
    return out.withColumn(flag_col, F.when(is_out, F.lit(flag_value)))


def group_string_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    sep: str = ", ",
    distinct: bool = False,
    alias: str = "flags",
) -> DataFrame:
    """Grouped string collapse (A8): ``paste(x[!is.na], collapse=', ')``
    (R/validation.R:241-256, R/export.R:107,550).

    The list is sorted before joining so results are deterministic under
    any partitioning — dplyr inherits input order; a distributed engine
    must impose one.
    """
    c = F.col(value_col)
    collected = F.collect_set(c) if distinct else F.collect_list(c)
    return df.groupBy(*group_cols).agg(
        F.array_join(F.array_sort(collected), sep).alias(alias)
    )


def distinct_last_wins(
    df: DataFrame, key_cols: Sequence[str], order_col: str
) -> DataFrame:
    """Grouped last-row-wins dedup (A13): ``group_by(key) |> slice_tail(1)``
    (R/airtable.R:342-345,381-384)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def approx_distinct(col: str | Column, rsd: float = 0.02) -> Column:
    """HyperLogLog++ distinct count (±rsd relative error).

    The 100 TB alternative to exact ``countDistinct`` — no per-group set
    materialization, partial-aggregatable, constant memory.  Never use
    where results feed an equality oracle (SURVEY §4 note 2).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.approx_count_distinct(c, rsd)


def approx_quantile(col: str | Column, q: float, accuracy: int = 10000) -> Column:
    """KLL-sketch quantile (rank error ≤ 1/accuracy).

    Mergeable partial sketches — one pass, no per-group sort.  The
    scale path for A3/A6 when exact interpolation parity isn't needed.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(c, F.lit(q), F.lit(accuracy))


def carry_by_max(value_col: str | Column, order_col: str | Column) -> Column:
    """Deterministic first/last-style carry-along (A2).

    dplyr's ``first(x)`` relies on the frame's prior arrange; a
    distributed engine must order explicitly (SURVEY §7.4 first-row
    nondeterminism).  ``max_by`` over an explicit ordering column is the
    aggregate form; pair the order column with a unique tie-break
    (e.g. ``F.struct(ts, id)``) when duplicates are possible.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    o = F.col(order_col) if isinstance(order_col, str) else order_col
    return F.max_by(v, o)


def sum_not_null(col: str | Column) -> Column:
    """R ``sum(x, na.rm=TRUE)`` — returns 0 (not NULL) when all inputs
    are NULL (§1.2 NULL-semantics note; R/validation.R:348)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.sum(c), F.lit(0.0))


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Pairwise association rules — the k=2 Apriori/market-basket
    step: for every UNORDERED item pair {a, b} co-occurring in at
    least ``min_pair_count`` baskets, support, confidence (both
    directions' max is NOT taken — a→b and b→a are emitted as the
    symmetric pair with per-item counts so the caller derives either)
    and lift.

    Input is (basket, item), pre-deduplicated.  Scale shape (r14): the
    pair generator is per-basket in-row combination arrays over the
    sorted distinct item set (the ``triangle_count`` pair-generation
    shape) — ONE basket-keyed aggregation exchange replaces the former
    basket-keyed SELF-JOIN (two branch reads of a checkpointed frame +
    a join whose hot keys are the big baskets); fanout is still
    C(basket_size, 2), bounded by the basket grain, never by corpus
    size.  The basket-array frame is the one materialized intermediate
    and feeds pair explode, item counts AND the basket count (the old
    shape checkpointed the 4×-larger row-grain frame).  Item counts
    stay one map-side-combinable groupBy; both count joins key on a
    single item (AQE-splittable skew — popular items are the hot
    keys).  Ratios are single divisions of exact BIGINTs,
    shape-identical across engines after ROUND (no sum-order hazard).

    Returns (item_a, item_b, n_ab, n_a, n_b, support, confidence_ab,
    lift) with item_a < item_b.
    """
    g = (
        baskets.select(F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it"))
        .groupBy("_bk")
        .agg(F.sort_array(F.collect_set("_it")).alias("_items"))
        # feeds pair explode + item counts + the basket count
        .localCheckpoint()
    )
    n_baskets = g.count()
    item_counts = (
        g.select(F.explode("_items").alias("_it"))
        .groupBy("_it")
        .agg(F.count(F.lit(1)).alias("n_i"))
    )
    it = F.col("_items")
    n_it = F.size(it)
    pair_arr = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n_it - 1),
            lambda i: F.transform(
                F.slice(it, i + 1, n_it - i),
                lambda x: F.struct(F.get(it, i - 1).alias("a"), x.alias("b")),
            ),
        )
    )
    # sequence(1, 0) would descend — guard single-item baskets
    pair_arr = F.when(n_it >= 2, pair_arr).otherwise(
        F.array().cast(f"array<struct<a:{g.schema['_items'].dataType.elementType.simpleString()},b:{g.schema['_items'].dataType.elementType.simpleString()}>>")
    )
    pairs = (
        g.select(F.explode(pair_arr).alias("_pr"))
        .groupBy(
            F.col("_pr.a").alias("item_a"), F.col("_pr.b").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    out = (
        pairs.join(item_counts.withColumnsRenamed({"_it": "item_a", "n_i": "n_a"}), "item_a")
        .join(item_counts.withColumnsRenamed({"_it": "item_b", "n_i": "n_b"}), "item_b")
    )
    return out.select(
        "item_a",
        "item_b",
        "n_ab",
        "n_a",
        "n_b",
        F.round(F.col("n_ab") / F.lit(n_baskets), 6).alias("support"),
        F.round(F.col("n_ab") / F.col("n_a"), 6).alias("confidence_ab"),
        F.round(
            (F.col("n_ab") * F.lit(n_baskets)) / (F.col("n_a") * F.col("n_b")), 6
        ).alias("lift"),
    )
