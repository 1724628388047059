"""Window-function operators (SURVEY §2.5-2.6)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_in_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str | Column,
    desc: bool = True,
    rank_col: str = "rank",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """row_number rank within group (W1): rank species by % of site
    catch (R/preprocessing-surveys.R:890-895, R/export.R:649-651).

    ``tiebreak`` columns make the rank deterministic — dplyr's
    ``row_number`` inherits the prior ``arrange``; Spark must order
    explicitly (SURVEY §7.4 first-row nondeterminism).
    """
    c = F.col(order_col) if isinstance(order_col, str) else order_col
    order = [c.desc() if desc else c.asc()] + [F.col(t) for t in tiebreak]
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w))


def top_k_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    k: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Top-k filter after rank (W2/W3): ``slice_max(n=k)``
    (R/preprocessing-surveys.R:896,806-811)."""
    ranked = rank_in_group(df, partition_cols, order_col, True, "_rk", tiebreak)
    return ranked.filter(F.col("_rk") <= k).drop("_rk")


def top_k_with_other(
    df: DataFrame,
    partition_cols: Sequence[str],
    label_col: str,
    value_col: str,
    k: int = 5,
    other_label: str = "Other",
) -> DataFrame:
    """Top-k labels per group, remainder re-aggregated into an 'Other'
    bucket (W2): R/export.R:649-667.

    One shuffle for the rank window, one for the re-aggregation; both
    hash on ``partition_cols`` so AQE reuses the exchange.
    """
    ranked = rank_in_group(df, partition_cols, value_col, True, "_rk", tiebreak=[label_col])
    bucketed = ranked.withColumn(
        label_col,
        F.when(F.col("_rk") <= k, F.col(label_col)).otherwise(F.lit(other_label)),
    )
    return bucketed.groupBy(*partition_cols, label_col).agg(
        F.sum(value_col).alias(value_col)
    )


def percent_of_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    value_col: str,
    pct_col: str = "pct",
) -> DataFrame:
    """Percent-of-group-total kept on rows (W6/A10):
    ``x / sum(x) over (site, month) * 100``
    (R/preprocessing-surveys.R:885-889, R/export.R:663-667)."""
    w = Window.partitionBy(*partition_cols)
    return df.withColumn(
        pct_col, F.col(value_col) / F.sum(value_col).over(w) * F.lit(100.0)
    )


def unique_per_group_flag(
    df: DataFrame, partition_cols: Sequence[str], flag_col: str = "unique_per_group"
) -> DataFrame:
    """Per-group cardinality == 1 flag (W5): ``n() == 1`` over
    (date, imei) (R/merge-trips.R:46-48)."""
    w = Window.partitionBy(*partition_cols)
    return df.withColumn(flag_col, F.count(F.lit(1)).over(w) == 1)


def renumber_from_max(
    df: DataFrame,
    partition_cols: Sequence[str],
    base_max_col: str,
    order_cols: Sequence[str],
    out_col: str = "n_catch",
) -> DataFrame:
    """Sequence numbering offset by a per-group max (W4): new rows get
    ``max(n) + row_number()`` (R/survey-reshaping.R:430-446)."""
    w = Window.partitionBy(*partition_cols).orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(
        out_col, F.coalesce(F.col(base_max_col), F.lit(0)) + F.row_number().over(w)
    )


def funnel_stages(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered conversion funnel: for each user, stage k counts only if
    it happens strictly AFTER the user's stage-(k−1) completion time —
    the product-analytics "signup → click → purchase" shape.

    Scale shape: one conditional-min aggregate per stage, every one
    keyed on the user — the whole chain is co-partitioned on
    ``user_col`` (one shuffle, reused), and the final stage counts
    reduce to a single row that ``stack``s into (stage, n_users)
    output.  No windows, no self-joins on event grain.

    Returns (stage_idx, stage, n_users, pct_of_first) with pct rounded
    to 6 (engine-exact: integer counts, one division).
    """
    per_user = events.filter(F.col(type_col).isin(*stages)).groupBy(user_col)
    agg_cols = []
    for i, s in enumerate(stages):
        agg_cols.append(
            F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"_t{i}")
        )
    u = per_user.agg(*agg_cols)
    # stage k's completion time only counts when it is strictly after
    # stage k-1's; re-derive the gated times left to right
    gated = [F.col("_t0")]
    for i in range(1, len(stages)):
        prev = gated[i - 1]
        gated.append(
            F.when(
                prev.isNotNull() & (F.col(f"_t{i}") > prev), F.col(f"_t{i}")
            )
        )
    counted = u.agg(
        *[F.count(g).alias(f"_n{i}") for i, g in enumerate(gated)]
    )
    stack_args = ", ".join(
        f"{i}, '{s}', _n{i}" for i, s in enumerate(stages)
    )
    return counted.selectExpr(
        f"stack({len(stages)}, {stack_args}) as (stage_idx, stage, n_users)"
    ).select(
        "stage_idx",
        "stage",
        "n_users",
        F.round(
            F.col("n_users")
            / F.first("n_users").over(
                Window.orderBy("stage_idx").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
            6,
        ).alias("pct_of_first"),
    )


def retention_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention: users grouped by the period of their FIRST
    event; for each (cohort, periods-since-cohort) cell, how many of
    the cohort's users were active.

    Scale shape: first-seen is one groupBy on the user; activity
    periods dedupe per (user, period) BEFORE the cohort join (events
    collapse to at most users × periods rows); the cohort frame joins
    back on the user key — co-partitioned with the first aggregate.
    All values are integral (dates floor to period indexes via epoch
    day arithmetic), so both engines agree bit-exactly.
    """
    day = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(86400))
    first = events.groupBy(user_col).agg(F.min(day).alias("_d0"))
    active = events.select(F.col(user_col), day.alias("_d")).distinct()
    j = active.join(first, user_col)
    cell = j.select(
        user_col,
        F.floor(F.col("_d0") / period_days).alias("cohort_period"),
        F.floor((F.col("_d") - F.col("_d0")) / period_days).alias(
            "periods_since"
        ),
    ).distinct()
    return (
        cell.groupBy("cohort_period", "periods_since")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
