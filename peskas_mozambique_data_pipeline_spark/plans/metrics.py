"""Fishery-metrics plan (M6): the normalized long metrics table
(entity × month × metric_type × metric_value) plus predominant gear and
top-k species shares.

Mirrors ``calculate_fishery_metrics``
(R/preprocessing-surveys.R:751-919): the R version builds each metric
block separately and bind_rows them; here each block is a branch of one
cached trip-level DataFrame and the union is by name (U1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.reshape import unpivot
from ..operators.windows import percent_of_group, rank_in_group


def _with_month(df: DataFrame) -> DataFrame:
    """Attach ``year_month`` unless the caller already carries it.
    Reusing an EXISTING column (same expression, computed upstream)
    lets a producer hash-partition once on (district, year_month) and
    have every metric branch's groupBy/window land on that exchange —
    a fresh ``withColumn`` would mint a new attribute the partitioning
    can't match (r15, guide §2.4)."""
    if "year_month" in df.columns:
        return df
    return df.withColumn(
        "year_month", F.date_trunc("month", "landing_date").cast("date")
    )


def monthly_site_metrics(trips: DataFrame) -> DataFrame:
    """Per (district, month): effort-weighted medians and totals,
    unpivoted to the long metric shape (R8)."""
    monthly = (
        _with_month(trips)
        .groupBy("district", "year_month")
        .agg(
            F.sum("catch_kg").alias("total_catch_kg"),
            F.percentile("cpue", F.lit(0.5)).alias("median_cpue"),
            F.percentile("rpue", F.lit(0.5)).alias("median_rpue"),
            F.percentile("price_per_kg", F.lit(0.5)).alias("median_price_kg"),
            F.count(F.lit(1)).cast("double").alias("n_submissions"),
        )
    )
    return unpivot(
        monthly,
        ["district", "year_month"],
        ["total_catch_kg", "median_cpue", "median_rpue", "median_price_kg", "n_submissions"],
    )


def predominant_gear(trips: DataFrame) -> DataFrame:
    """Most frequent gear per (district, month) with deterministic
    tie-break (W3; R/preprocessing-surveys.R:806-811)."""
    counts = (
        _with_month(trips)
        .groupBy("district", "year_month", "gear_type")
        .agg(F.count(F.lit(1)).alias("gear_count"))
    )
    ranked = rank_in_group(
        counts, ["district", "year_month"], "gear_count", True, "_rk", ["gear_type"]
    )
    return ranked.filter(F.col("_rk") == 1).select(
        "district", "year_month", F.col("gear_type").alias("predominant_gear"), "gear_count"
    )


def top_species_share(catch: DataFrame, k: int = 2) -> DataFrame:
    """Top-k species by share of site-month catch (W1/W2/W6;
    R/preprocessing-surveys.R:885-896)."""
    per_species = (
        _with_month(catch)
        .groupBy("district", "year_month", "catch_taxon")
        .agg(F.sum("catch_kg").alias("species_catch_kg"))
    )
    with_pct = percent_of_group(
        per_species, ["district", "year_month"], "species_catch_kg", "species_pct"
    )
    ranked = rank_in_group(
        with_pct, ["district", "year_month"], "species_pct", True, "rank", ["catch_taxon"]
    )
    return ranked.filter(F.col("rank") <= k)


def fishery_metrics(trips: DataFrame, catch: DataFrame) -> DataFrame:
    """The combined long metrics table: metric blocks unioned by name
    with ragged columns allowed (U1)."""
    site = monthly_site_metrics(trips)
    gear = predominant_gear(trips).select(
        "district",
        "year_month",
        F.lit("predominant_gear").alias("metric_type"),
        F.col("gear_count").cast("double").alias("metric_value"),
        F.col("predominant_gear").alias("gear_type"),
    )
    species = top_species_share(catch).select(
        "district",
        "year_month",
        F.lit("species_pct").alias("metric_type"),
        F.col("species_pct").alias("metric_value"),
        F.col("catch_taxon").alias("species"),
        F.col("rank"),
    )
    return site.unionByName(gear, allowMissingColumns=True).unionByName(
        species, allowMissingColumns=True
    )
