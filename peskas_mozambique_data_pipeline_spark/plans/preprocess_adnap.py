"""Preprocessing plan for the ADNAP survey form.

The reference's second ingest shape (R/preprocessing-surveys.R:1100-1374,
R/survey-reshaping.R:25-86): positional repeat groups arrive as dotted
column families ``species_group.<idx>.species_group/<var>``, the species
name is spread across many variant columns (``species_TL``,
``species_RF``, … coalesced, R/survey-reshaping.R:523-533), trip
duration derives from start/end timestamps, and over-100cm fish live in
separate columns whose VALUE is the length (R/survey-reshaping.R:326-449).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import coalesce_cols
from ..functions.dates import duration_hours
from ..functions.strings import normalize_name, title_case_clean
from ..operators.reshape import stack_length_bins
from ..operators.windows import renumber_from_max
from .preprocess import bin_midpoint

# the species column variants, in the reference's coalesce priority
SPECIES_VARIANTS = (
    "species_TL", "species_RF", "species_SH", "species_FSH", "species_CRB",
    "species_CE", "species_LO", "species_CR", "species_MA", "species_OY",
    "species_FI", "species_FFI", "species_RA", "species_SHK", "species_MZZ",
)


def general_info_adnap(raw: DataFrame) -> DataFrame:
    """Trip-level attributes (R/preprocessing-surveys.R:1127-1208):
    district variants coalesced, duration from start/end timestamps."""
    cols = set(raw.columns)
    district_variants = [c for c in cols if c.startswith("district")] or ["provincia"]
    return raw.select(
        "submission_id",
        F.to_timestamp("fishing_start").alias("fishing_start"),
        F.to_timestamp("fishing_end").alias("fishing_end"),
        duration_hours(
            F.to_timestamp("fishing_start"), F.to_timestamp("fishing_end")
        ).alias("trip_duration"),
        title_case_clean(coalesce_cols(*district_variants)).alias("district"),
        normalize_name("_submitted_by").alias("enumerator"),
        F.col("boat_pds").alias("pds_imei"),
        F.col("gear_type"),
        F.to_timestamp("fishing_end").alias("landing_date"),
    )


def _positional_groups(raw: DataFrame) -> dict[int, dict[str, str]]:
    """Discover dotted positional columns
    ``species_group.<idx>.species_group/<var>`` at plan-build time."""
    found: dict[int, dict[str, str]] = {}
    pat = re.compile(r"^species_group\.(\d+)\.(?:species_group/)?(.+)$")
    for c in raw.columns:
        m = pat.match(c)
        if m:
            var = m.group(2).replace("no_fish_by_length_group/", "")
            found.setdefault(int(m.group(1)), {})[var] = c
    return found


def catch_long_adnap(raw: DataFrame) -> DataFrame:
    """Positional repeat-group melt: one row per (submission, n_catch)
    with the species name coalesced across variant columns.  Position is
    0-based in the source, 1-based in the output (R/survey-reshaping.R:
    25-86)."""
    groups = _positional_groups(raw)
    if not groups:
        raise ValueError("no species_group.<n>.* columns found")
    var_names = sorted({v for cols in groups.values() for v in cols})
    structs = []
    for idx, cols in sorted(groups.items()):
        fields = [F.lit(idx + 1).alias("n_catch")] + [
            (F.col(f"`{cols[v]}`") if v in cols else F.lit(None).cast("string")).alias(v)
            for v in var_names
        ]
        structs.append(F.struct(*fields))
    exploded = raw.select(
        "submission_id", F.explode(F.array(*structs)).alias("_g")
    ).select("submission_id", "_g.*")

    present_variants = [v for v in SPECIES_VARIANTS if v in var_names]
    non_null = None
    for v in var_names:
        c = F.col(v).isNotNull()
        non_null = c if non_null is None else (non_null | c)
    out = exploded.filter(non_null)
    if present_variants:
        out = out.withColumn("selected_species", coalesce_cols(*present_variants))
    return out


def catch_info_adnap(raw: DataFrame, lw_coeffs: DataFrame) -> DataFrame:
    """Catch records: length-frequency stack + direct catch_weight
    passthrough + LW model for binned rows."""
    long = catch_long_adnap(raw)
    bin_cols = [c for c in long.columns if c.startswith("no_individuals_")]
    keep = ["submission_id", "n_catch", "selected_species", "counting_method",
            "n_buckets", "weight_bucket", "catch_weight"]
    keep = [c for c in keep if c in long.columns]

    has_bins = None
    for c in bin_cols:
        cond = F.col(c).isNotNull()
        has_bins = cond if has_bins is None else (has_bins | cond)

    binned = stack_length_bins(long.filter(has_bins), keep, bin_cols)
    no_bins = (
        long.filter(~F.coalesce(has_bins, F.lit(False)))
        .select(*keep)
        .withColumn("length_range", F.lit(None).cast("string"))
        .withColumn("count", F.lit(None).cast("double"))
    )
    lengths = binned.withColumn("count", F.col("count").cast("double")).unionByName(no_bins)
    lengths = lengths.withColumn("length", bin_midpoint(F.col("length_range")))

    with_coeffs = lengths.join(
        F.broadcast(lw_coeffs.select(F.col("catch_taxon").alias("selected_species"), "a", "b")),
        "selected_species",
        "left",
    )
    modeled = F.col("a") * F.pow(F.col("length"), F.col("b")) * F.col("count") / 1000.0
    # direct catch_weight is used only when the enumerator weighed the
    # catch (counting_method == "3", R/preprocessing-surveys.R:1251-1257);
    # unconditional coalesce would duplicate one weight onto every
    # exploded length-bin row, inflating totals
    if "catch_weight" not in with_coeffs.columns:
        direct = F.lit(None).cast("double")
    elif "counting_method" in with_coeffs.columns:
        direct = F.when(
            F.col("counting_method") == "3", F.col("catch_weight").cast("double")
        )
    else:
        direct = F.col("catch_weight").cast("double")
    bucket_est = F.col("n_buckets").cast("double") * F.col("weight_bucket").cast("double")
    return with_coeffs.select(
        "submission_id",
        "n_catch",
        F.col("selected_species").alias("catch_taxon"),
        "length_range",
        "length",
        F.col("count").alias("n_individuals"),
        F.coalesce(direct, modeled, bucket_est).alias("catch_kg"),
    )


def over100_catch(raw: DataFrame, base_catch: DataFrame) -> DataFrame:
    """Over-100cm extraction (R5): ``fish_length_over100...N`` columns
    hold the LENGTH itself (count := 1); rows are numbered after the
    per-submission max n_catch (W4)."""
    over_cols = [c for c in raw.columns if "fish_length_over100" in c]
    if not over_cols:
        return base_catch.limit(0)
    long = raw.select(
        "submission_id",
        F.explode(
            F.array(*[F.col(f"`{c}`").cast("double") for c in over_cols])
        ).alias("length"),
    ).filter(F.col("length").isNotNull())
    max_n = base_catch.groupBy("submission_id").agg(F.max("n_catch").alias("max_n_catch"))
    with_max = long.join(max_n, "submission_id", "left")
    renumbered = renumber_from_max(with_max, ["submission_id"], "max_n_catch", ["length"])
    return renumbered.select(
        "submission_id",
        "n_catch",
        F.lit(None).cast("string").alias("catch_taxon"),
        F.lit(None).cast("string").alias("length_range"),
        "length",
        F.lit(1.0).alias("n_individuals"),
        F.lit(None).cast("double").alias("catch_kg"),
    )


def preprocess_landings_adnap(raw: DataFrame, lw_coeffs: DataFrame) -> DataFrame:
    """Full ADNAP preprocessing DAG: general attributes left-joined with
    the melted catch records plus over-100cm rows (ragged union U1)."""
    general = general_info_adnap(raw)
    catch = catch_info_adnap(raw, lw_coeffs)
    catch = catch.unionByName(over100_catch(raw, catch), allowMissingColumns=True)
    return general.join(catch, "submission_id", "left")
