"""Export/analytics plan (E3): the portal-facing analytic products.

Mirrors ``export_lurio_landings`` (R/export.R:474-781): one validated
trip table cached, six branch DAGs: monthly densified metrics, site
stats with a HAVING filter, top-k-with-Other taxa shares, the nested
habitat→gear JSON series (A12), the taxa/length rows with the taxa-dim
english-name join (R/export.R:619-634), and the geo product — per-site
stats rolled up to per-region medians and attribute-joined onto the
regions GeoJSON layer (R/export.R:711-746, composing io/geojson.py).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..io.geojson import join_attributes
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


def sites_stats_full(
    trips: DataFrame,
    min_submissions: int = 3,
    exact_cents: bool = False,
    group_cols: Sequence[str] = ("district", "landing_site"),
) -> DataFrame:
    """The reference's full seven-stat per-site table
    (R/export.R:604-617): per (district, landing_site) the submission
    count plus means of fishers, trip hours, catch, CPUE, price and
    RPUE, keeping groups above the sample floor with a non-null site.

    ``exact_cents=True`` computes each mean as an integer-cents sum
    divided back to double — order-independent and bit-reproducible
    across engines (the oracle path); the default float ``avg`` is the
    production path (same values to ~1e-12, one fewer projection).
    Non-null counts are the denominator either way (R's na.rm).
    """
    stats = {
        "n_fishers": "n_fishers",
        "trip_duration_hrs": "trip_duration",
        "mean_catch_kg": "catch_kg",
        "cpue_kg_fisher_hr": "cpue",
        "mean_catch_price_mzn": "price_per_kg",
        "price_per_kg_mzn": "rpue",
    }
    if exact_cents:
        aggs = {
            out: F.sum(F.round(F.col(src) * 100).cast("long")).cast("double")
            / F.count(F.col(src))
            / F.lit(100.0)
            for out, src in stats.items()
        }
    else:
        aggs = {out: F.avg(F.col(src)) for out, src in stats.items()}
    return per_site_stats(trips, list(group_cols), aggs, min_submissions)


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


def taxa_length(catch: DataFrame, taxa_dim: DataFrame) -> DataFrame:
    """Taxa/length export rows (R/export.R:619-634): keep catch rows
    with both a taxon and a measured length, broadcast-join the taxa
    dimension on scientific name (deduplicated, keep-first like the
    reference's ``distinct(.keep_all = TRUE)``), and emit the english
    name as ``catch_taxon`` with the length class."""
    rows = catch.filter(
        F.col("catch_taxon").isNotNull() & F.col("length").isNotNull()
    ).select(
        F.col("catch_taxon").alias("scientific_name"),
        F.col("length").alias("length_class"),
    )
    dim = taxa_dim.dropDuplicates(["scientific_name"]).select(
        "scientific_name", "english_name"
    )
    return rows.join(F.broadcast(dim), "scientific_name", "left").select(
        F.col("english_name").alias("catch_taxon"), "length_class"
    )


def per_site_stats(
    trips: DataFrame,
    group_cols: Sequence[str],
    aggs: Mapping[str, Column],
    min_submissions: int = 3,
) -> DataFrame:
    """Per-(district, landing_site) stat table (R/export.R:604-617):
    arbitrary aggregates plus an ``n_submissions`` count, keeping only
    groups above the sample floor with a non-null site key (the
    reference's HAVING-style filter)."""
    gcols = list(group_cols)
    out = (
        trips.groupBy(*gcols)
        .agg(F.count(F.lit(1)).alias("n_submissions"), *[c.alias(n) for n, c in aggs.items()])
        .filter(F.col("n_submissions") > min_submissions)
    )
    return out.filter(F.col(gcols[-1]).isNotNull())


def region_median_rollup(
    site_stats: DataFrame,
    region_col: str,
    median_cols: Sequence[str],
    sum_cols: Sequence[str] = ("n_submissions",),
    out_region: str = "region",
) -> DataFrame:
    """Second-stage geo rollup (R/export.R:725-741): per-region medians
    of the per-site stats (submission counts summed), region key
    lowercased and renamed to match the geo layer's join attribute."""
    aggs = [F.sum(c).alias(c) for c in sum_cols] + [
        F.round(F.percentile(F.col(c), F.lit(0.5)), 6).alias(c) for c in median_cols
    ]
    return (
        site_stats.groupBy(region_col)
        .agg(*aggs)
        .select(
            F.lower(F.col(region_col)).alias(out_region),
            *sum_cols,
            *median_cols,
        )
    )


def geo_region_indicators(
    geo: DataFrame, rollup: DataFrame, on: str = "region"
) -> DataFrame:
    """Attribute-join the per-region rollup onto the GeoJSON layer
    (R/export.R:743-746) — the layer is tiny (admin regions), the
    rollup is broadcast; left join keeps regions with no data."""
    return join_attributes(geo, rollup, on=on)
