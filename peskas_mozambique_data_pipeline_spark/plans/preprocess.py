"""Preprocessing plan: raw wide Kobo survey → long catch records
enriched with dimensions and model-derived catch weight.

Mirrors the reference entry point ``preprocess_landings_lurio``
(R/preprocessing-surveys.R:30-332) as one lazy DataFrame DAG:

raw (all-string, ``group_*/``-prefixed, indexed repeat-group columns)
  → general/trip/catch/market frames → N-ary full join (J2)
  → dimension enrichment (J1, broadcast) → LW catch model (M1).

The R code reshapes repeat groups by regex-driven ``pivot_longer`` and
per-row loops; here the same semantics compile to one ``stack()``
Expand + pivot — set-based, single pass, no Python in the loop.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.columns import coalesce_cols, recode, row_sum, strip_suffix_underscores
from ..functions.strings import normalize_name, title_case_clean
from ..operators.joins import enrich, nary_full_join
from ..operators.reshape import rename_by_regex, stack_length_bins

HABITAT_MAP = {
    "1": "Reef",
    "2": "Mangrove",
    "3": "Seagrass",
    "4": "Sand",
    "5": "Rock",
    "6": "Pelagic",
    "7": "Estuary",
}

# length-class midpoints for the catch model (reference recodes bin
# labels to midpoints, R/preprocessing-surveys.R:573-587)
def bin_midpoint(length_range: Column) -> Column:
    lo = F.split(length_range, "_").getItem(0).cast("double")
    hi = F.split(length_range, "_").getItem(1).cast("double")
    return (
        F.when(length_range.startswith("over"), F.regexp_extract(length_range, r"over(\d+)", 1).cast("double") + 2.5)
        .otherwise((lo + hi) / 2.0)
    )


def general_info(raw: DataFrame) -> DataFrame:
    """Trip-level general attributes (R/preprocessing-surveys.R:76-136)."""
    df = rename_by_regex(raw, r"^group_general/")
    gps = F.split(F.col("location_coordinates"), " ")
    # optional site keys for the composite dim_sites join (J1 composite
    # key, R/preprocessing-surveys.R:1009-1012) — survey-form dependent
    site_cols = [c for c in ("site_code", "gaul_2_code") if c in df.columns]
    return df.select(
        "submission_id",
        *site_cols,
        F.to_timestamp("landing_date").alias("landing_date"),
        F.to_timestamp("today").alias("submission_date"),
        normalize_name("enumerator").alias("enumerator"),
        title_case_clean(coalesce_cols("district_palma", "district_mocimboa", "district")).alias(
            "district"
        ),
        F.col("survey_activity"),
        F.col("catch_outcome"),
        gps.getItem(0).cast("double").alias("lat"),
        gps.getItem(1).cast("double").alias("lon"),
    )


def trip_info(raw: DataFrame) -> DataFrame:
    """Effort attributes (R/preprocessing-surveys.R:138-193)."""
    df = rename_by_regex(raw, r"^group_trip/")
    return df.select(
        "submission_id",
        F.col("trip_duration").cast("double").alias("trip_duration"),
        row_sum(
            strip_suffix_underscores("no_men_fishers"),
            strip_suffix_underscores("no_women_fishers"),
            strip_suffix_underscores("no_child_fishers"),
        ).alias("n_fishers"),
        F.col("gear_type"),
        recode("habitat", HABITAT_MAP, default=F.lit(None)).alias("habitat"),
        coalesce_cols("hook_size", "hook_size_other").alias("hook_size"),
        F.col("boat_reg_no"),
        F.col("pds_imei"),
    )


def _species_columns(raw: DataFrame) -> dict[int, dict[str, str]]:
    """Discover indexed repeat-group columns ``group_species/<n>/<var>``
    at plan-build time (the reference greps names at run time,
    R/preprocessing-surveys.R:486)."""
    found: dict[int, dict[str, str]] = {}
    for c in raw.columns:
        m = re.match(r"^group_species/(\d+)/(.+)$", c)
        if m:
            found.setdefault(int(m.group(1)), {})[m.group(2)] = c
    return found


def catch_long(raw: DataFrame) -> DataFrame:
    """Repeat-group melt (R1/R3): one row per (submission, n_catch)
    species entry, dropping positions where every field is NULL
    (R/preprocessing-surveys.R:489-508)."""
    groups = _species_columns(raw)
    if not groups:
        raise ValueError("no group_species/<n>/ columns found")
    var_names = sorted({v for cols in groups.values() for v in cols})
    structs = []
    for n, cols in sorted(groups.items()):
        fields = [F.lit(n).alias("n_catch")] + [
            (F.col(cols[v]) if v in cols else F.lit(None).cast("string")).alias(v)
            for v in var_names
        ]
        structs.append(F.struct(*fields))
    exploded = raw.select(
        "submission_id", F.explode(F.array(*structs)).alias("_g")
    ).select("submission_id", "_g.*")
    non_null = None
    for v in var_names:
        c = F.col(v).isNotNull()
        non_null = c if non_null is None else (non_null | c)
    return exploded.filter(non_null)


def catch_info(raw: DataFrame, lw_coeffs: DataFrame) -> DataFrame:
    """Catch records with length-frequency expansion (R4) and modeled
    weight (M1): catch_kg = a·L^b·N/1000, octopus TL→ML L/5.5, bucket
    fallback n_buckets × weight_bucket
    (R/preprocessing-surveys.R:691-734)."""
    long = catch_long(raw)
    bin_cols = [c for c in long.columns if c.startswith("no_individuals_")]
    # measured over-length columns: for an "overNN" bin the reference
    # substitutes the MEASURED fish_length_overNN value for the NN+2.5
    # midpoint when one was recorded (R/preprocessing-surveys.R:580-587)
    over_cols = [c for c in long.columns if c.startswith("fish_length_over")]
    keep = ["submission_id", "n_catch", "selected_species", "collection_type",
            "n_buckets", "weight_bucket", "catch_estimate", *over_cols]
    # split on a per-row predicate instead of stacking-then-anti-joining:
    # no shuffle, and the exploded frame isn't recomputed for the
    # passthrough branch
    has_bins = None
    for c in bin_cols:
        cond = F.col(c).isNotNull()
        has_bins = cond if has_bins is None else (has_bins | cond)
    binned = stack_length_bins(long.filter(has_bins), keep, bin_cols)
    # species groups with no length data pass through as a single row
    # (R/survey-reshaping.R:193-201) — e.g. bucket-only estimates
    no_bins = (
        long.filter(~F.coalesce(has_bins, F.lit(False)))
        .select(*keep)
        .withColumn("length_range", F.lit(None).cast("string"))
        .withColumn("count", F.lit(None).cast("double"))
    )
    lengths = binned.withColumn("count", F.col("count").cast("double")).unionByName(no_bins)
    length_expr = bin_midpoint(F.col("length_range"))
    for c in over_cols:
        m = re.search(r"over_?(\d+)", c)
        if not m:
            continue
        length_expr = F.when(
            (F.regexp_extract(F.col("length_range"), r"over_?(\d+)", 1) == m.group(1))
            & F.col(c).cast("double").isNotNull(),
            F.col(c).cast("double"),
        ).otherwise(length_expr)
    lengths = lengths.withColumn("length", length_expr)
    lengths = lengths.drop(*over_cols)

    with_coeffs = lengths.join(
        F.broadcast(lw_coeffs.select(
            F.col("catch_taxon").alias("selected_species"), "a", "b",
        )),
        "selected_species",
        "left",
    )
    # octopus: total length to mantle length before the power law
    model_length = F.when(
        F.col("selected_species") == "OCZ", F.col("length") / 5.5
    ).otherwise(F.col("length"))
    modeled = F.col("a") * F.pow(model_length, F.col("b")) * F.col("count").cast("double") / 1000.0
    bucket_est = F.col("n_buckets").cast("double") * F.col("weight_bucket").cast("double")
    direct = F.when(F.col("collection_type") == "3", F.col("catch_estimate").cast("double"))
    catch_kg = F.coalesce(direct, modeled, bucket_est)
    return with_coeffs.select(
        "submission_id",
        "n_catch",
        F.col("selected_species").alias("catch_taxon"),
        "length_range",
        "length",
        F.col("count").cast("double").alias("n_individuals"),
        F.col("n_buckets").cast("double").alias("n_buckets"),
        F.col("weight_bucket").cast("double").alias("weight_bucket"),
        catch_kg.alias("catch_kg"),
    )


def market_info(raw: DataFrame) -> DataFrame:
    """Market attributes (R/preprocessing-surveys.R:269-284)."""
    df = rename_by_regex(raw, r"^group_market/")
    return df.select(
        "submission_id",
        coalesce_cols(
            F.col("catch_price").cast("double"),
            F.col("total_catch_value").cast("double"),
        ).alias("catch_price"),
        F.col("catch_use"),
    )


def preprocess_landings(
    raw: DataFrame,
    lw_coeffs: DataFrame,
    dim_gear: DataFrame | None = None,
    dim_taxa: DataFrame | None = None,
    dim_sites: DataFrame | None = None,
) -> DataFrame:
    """Full preprocessing DAG (E1).

    Catch rows are the grain; general/trip/market trip-level frames are
    merged with an N-ary full join on submission_id (J2) then the catch
    frame joins in (left), and small dims broadcast-enrich (J1).
    """
    trip_level = nary_full_join(
        [general_info(raw), trip_info(raw), market_info(raw)], "submission_id"
    )
    catch = catch_info(raw, lw_coeffs)
    out = trip_level.join(catch, "submission_id", "left")
    # catch_outcome == "0" zeroes the catch (R/preprocessing-surveys.R:1251-1257)
    out = out.withColumn(
        "catch_kg",
        F.when(F.col("catch_outcome") == "0", F.lit(0.0)).otherwise(F.col("catch_kg")),
    )
    dims = []
    if dim_gear is not None:
        dims.append((
            dim_gear.select(F.col("survey_label").alias("gear_type"),
                            F.col("standard_name").alias("gear")),
            "gear_type",
        ))
    if dim_taxa is not None:
        dims.append((
            dim_taxa.select(F.col("survey_label").alias("catch_taxon"),
                            "scientific_name", "english_name"),
            "catch_taxon",
        ))
    if dim_sites is not None:
        # composite join key (site_code, gaul_2_code) —
        # R/preprocessing-surveys.R:1009-1012
        dims.append((
            dim_sites.select("site_code", "gaul_2_code", "site"),
            ["site_code", "gaul_2_code"],
        ))
    return enrich(out, dims) if dims else out
