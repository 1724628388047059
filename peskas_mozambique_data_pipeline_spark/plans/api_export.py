"""API export plan: the flat per-trip / per-catch files the portal API
serves (R/api.R:62-158 export_api_raw, :220-316 export_api_validated).

Shape: synthesized trip ids (P14), integer catch counts, per-trip
window totals (A10), stable column order, lz4 parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..io.parquet_io import write_versioned


def api_trips(validated: DataFrame, survey_id: str = "mozambique-lurio") -> DataFrame:
    """Trip-level API table: TRIP_-prefixed id (R/api.R:76-84), effort
    fields, per-trip totals."""
    return validated.select(
        F.concat(F.lit("TRIP_"), F.col("submission_id")).alias("trip_id"),
        F.lit(survey_id).alias("survey_id"),
        F.lit("mozambique").alias("country"),
        F.col("landing_date").cast("date").alias("landing_date"),
        "district",
        "gear_type",
        F.col("n_fishers").cast("int").alias("n_fishers"),
        "trip_duration",
        "catch_kg",
        "catch_price",
        "cpue",
        "rpue",
        "price_per_kg",
    )


def api_catch(catch: DataFrame) -> DataFrame:
    """Catch-level API table with per-trip totals kept on rows (A10:
    ``tot_catch_kg = sum(catch_kg) over trip``, R/api.R:112-117)."""
    w = Window.partitionBy("submission_id")
    return catch.select(
        F.concat(F.lit("TRIP_"), F.col("submission_id")).alias("trip_id"),
        F.col("n_catch").cast("int").alias("n_catch"),
        "catch_taxon",
        "length",
        F.col("n_individuals").cast("int").alias("n_individuals"),
        "catch_kg",
        F.sum("catch_kg").over(w).alias("tot_catch_kg"),
    )


def export_api(
    validated: DataFrame,
    catch: DataFrame,
    zone_dir: str,
    git_sha: str = "local",
) -> dict[str, str]:
    """Write both API files as versioned lz4 parquet snapshots
    (R/api.R:133-138) and return their paths."""
    paths = {
        "trips": write_versioned(api_trips(validated), zone_dir, "api_trips", git_sha),
        "catch": write_versioned(api_catch(catch), zone_dir, "api_catch", git_sha),
    }
    return paths
