"""Validation plan: rule-flag battery + robust statistical bounds →
flag table, validated subset, and per-trip indicators.

Mirrors ``validate_surveys_lurio`` (R/validation.R:45-457).  The 13
numbered rule flags are data — a list of (flag_id, predicate) pairs
evaluated as ``when`` columns in one pass — not 13 hand-written
branches; the statistical outlier flags come from the reusable
``robust_bounds`` aggregate (A7).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.columns import flag_concat, safe_div
from ..operators.aggregates import robust_bounds, sum_not_null
from ..operators.joins import anti_join


def default_rule_flags() -> list[tuple[str, Column]]:
    """The reference's rule battery (R/validation.R:127-201,563-659),
    thresholds from inst/config.yml: 50 kg/catch, 300 buckets,
    200 individuals, 2500 MZN price, 30 CPUE, 60 h trip."""
    return [
        ("1_no_activity", (F.col("survey_activity") == "0")),
        ("2_zero_fishers", F.col("n_fishers").isNotNull() & (F.col("n_fishers") == 0)),
        ("5_catch_gt_50kg", F.col("catch_kg") > 50.0),
        ("6_buckets_gt_300", F.col("n_buckets").cast("double") > 300.0),
        ("7_individuals_gt_200", F.col("n_individuals") > 200.0),
        ("12_bad_duration", F.col("trip_duration").isNotNull()
         & ((F.col("trip_duration") <= 0) | (F.col("trip_duration") > 60))),
        ("13_date_order", F.col("submission_date") < F.col("landing_date")),
    ]


def apply_rule_flags(
    df: DataFrame, rules: Sequence[tuple[str, Column]] | None = None
) -> DataFrame:
    """Evaluate every rule as a when-column and consolidate into one
    comma-joined ``alert_flag`` per row (A9 via concat_ws — NULLs skip
    natively, no 'NA' scrubbing like R/validation.R:211-234)."""
    rules = list(rules or default_rule_flags())
    flag_cols = [F.when(cond, F.lit(fid)) for fid, cond in rules]
    return df.withColumn("alert_flag", flag_concat(*flag_cols, sep=","))


def statistical_flags(
    df: DataFrame,
    value_col: str = "catch_price",
    group_cols: Sequence[str] = ("gear_type",),
    k: float = 3.0,
    flag_id: str = "8_price_outlier",
) -> DataFrame:
    """Per-group MAD-bounds outlier flag (A7 + J10): join the tiny
    bounds table back (broadcast) and mark out-of-range rows."""
    bounds = robust_bounds(df, list(group_cols), value_col, k=k)
    joined = df.join(F.broadcast(bounds), list(group_cols), "left")
    v = F.col(value_col)
    out_of_range = (
        v.isNotNull()
        & F.col("upper_bound").isNotNull()
        & ((v < F.col("lower_bound")) | (v > F.col("upper_bound")))
    )
    return joined.withColumn(
        "stat_flag", F.when(out_of_range, F.lit(flag_id))
    ).drop("lower_bound", "upper_bound")


def consolidate_flags(df: DataFrame) -> DataFrame:
    """Per-submission flag rollup: distinct sorted flags joined ','
    (R/validation.R:241-256 paste-collapse, deterministic here)."""
    split_flags = F.flatten(
        F.collect_list(
            F.split(flag_concat(F.col("alert_flag"), F.col("stat_flag"), sep=","), ",")
        )
    )
    return (
        df.groupBy("submission_id", "submission_date")
        .agg(
            F.array_join(F.array_sort(F.array_distinct(split_flags)), ",").alias("alert_flag")
        )
        .withColumn(
            "alert_flag",
            F.when(F.col("alert_flag") == "", F.lit(None)).otherwise(F.col("alert_flag")),
        )
    )


def trip_indicators(validated: DataFrame) -> DataFrame:
    """Per-trip composite indicators (M4): trip totals then
    CPUE = catch / fishers / duration, RPUE likewise from price; R's
    Inf-on-divide-by-zero is normalized to NULL at the source
    (R/validation.R:332-374)."""
    per_trip = validated.groupBy("submission_id").agg(
        sum_not_null("catch_kg").alias("catch_kg"),
        F.first("catch_price", ignorenulls=True).alias("catch_price"),
        F.first("n_fishers", ignorenulls=True).alias("n_fishers"),
        F.first("trip_duration", ignorenulls=True).alias("trip_duration"),
        F.first("gear_type", ignorenulls=True).alias("gear_type"),
        F.first("habitat", ignorenulls=True).alias("habitat"),
        F.first("district", ignorenulls=True).alias("district"),
        F.first("landing_date", ignorenulls=True).alias("landing_date"),
    )
    effort = F.col("n_fishers") * F.col("trip_duration")
    return per_trip.select(
        "*",
        safe_div(F.col("catch_kg"), effort).alias("cpue"),
        safe_div(F.col("catch_price"), effort).alias("rpue"),
        safe_div(F.col("catch_price"), F.col("catch_kg")).alias("price_per_kg"),
    )


def validate_surveys(
    preprocessed: DataFrame,
    rules: Sequence[tuple[str, Column]] | None = None,
    price_group_cols: Sequence[str] = ("gear_type",),
    k: float = 3.0,
) -> tuple[DataFrame, DataFrame]:
    """Full validation DAG (E2).

    Returns (validated, flags): ``flags`` is one row per submission with
    its consolidated alert string; ``validated`` excludes flagged
    submissions via anti-join (J7) and carries trip indicators.
    """
    flagged = apply_rule_flags(preprocessed, rules)
    flagged = statistical_flags(flagged, group_cols=price_group_cols, k=k)
    flags = consolidate_flags(flagged)
    bad_ids = flags.filter(F.col("alert_flag").isNotNull()).select("submission_id")
    clean = anti_join(preprocessed, bad_ids, "submission_id")
    return trip_indicators(clean), flags


def explode_flags(flags: DataFrame) -> DataFrame:
    """One row per (submission, flag) for the flags sink
    (R/validation.R:1291-1294 separate_rows)."""
    return flags.filter(F.col("alert_flag").isNotNull()).select(
        "submission_id",
        "submission_date",
        F.explode(F.split("alert_flag", ",")).alias("flag"),
    )
