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
