"""Export/analytics plan (E3): the portal-facing analytic products.

Mirrors ``export_lurio_landings`` (R/export.R:474-781): one validated
trip table cached, six branch DAGs.  Branches implemented here:
monthly densified metrics, site stats with a HAVING filter, top-k-
with-Other taxa shares, and the nested habitat→gear JSON series (A12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.reshape import complete_months, unpivot
from ..operators.windows import percent_of_group, top_k_with_other


def monthly_metrics(trips: DataFrame) -> DataFrame:
    """Median indicator per (district, month), calendar-densified so
    missing months appear as NULL rows (R7), then unpivoted (R8)
    (R/export.R:568-602)."""
    monthly = (
        trips.withColumn("month", F.date_trunc("month", "landing_date").cast("date"))
        .groupBy("district", "month")
        .agg(
            F.percentile("cpue", F.lit(0.5)).alias("median_cpue"),
            F.percentile("price_per_kg", F.lit(0.5)).alias("median_price_kg"),
            F.sum("catch_kg").alias("total_catch_kg"),
        )
    )
    dense = complete_months(monthly, ["district"], "month")
    return unpivot(
        dense,
        ["district", "month"],
        ["median_cpue", "median_price_kg", "total_catch_kg"],
    )


def sites_stats(trips: DataFrame, min_submissions: int = 3) -> DataFrame:
    """Per-district means, keeping only districts with enough samples —
    the HAVING-style filter (R/export.R:604-617)."""
    return (
        trips.groupBy("district")
        .agg(
            F.count(F.lit(1)).alias("n_submissions"),
            F.avg("catch_kg").alias("mean_catch_kg"),
            F.avg("cpue").alias("mean_cpue"),
        )
        .filter(F.col("n_submissions") > min_submissions)
    )


def taxa_shares(catch: DataFrame, k: int = 5) -> DataFrame:
    """Top-k taxa per district by catch with an 'Other' bucket, plus
    percent-of-district (R/export.R:636-693)."""
    per_taxon = catch.groupBy("district", "catch_taxon").agg(
        F.sum("catch_kg").alias("catch_kg")
    )
    bucketed = top_k_with_other(per_taxon, ["district"], "catch_taxon", "catch_kg", k=k)
    return percent_of_group(bucketed, ["district"], "catch_kg", "pct_catch")


def habitat_gear_series(trips: DataFrame) -> DataFrame:
    """Nested chart series (A12): per habitat an ordered list of
    {x: gear, y: total catch} pairs serialized to JSON
    (R/export.R:696-706,795-821)."""
    per_gear = trips.groupBy("habitat", "gear_type").agg(
        F.sum("catch_kg").alias("y")
    )
    series = per_gear.groupBy("habitat").agg(
        F.to_json(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("y")).alias("neg"), F.col("gear_type").alias("x"), F.col("y")))
                ),
                lambda s: F.struct(s.x.alias("x"), s.y.alias("y")),
            )
        ).alias("series")
    )
    return series
