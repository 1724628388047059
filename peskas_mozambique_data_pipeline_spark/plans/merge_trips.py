"""Trip-merging plan (J5): conditional 1:1 join of GPS tracker trips
with survey landings by (landing_date, imei).

Mirrors ``merge_trips`` (R/merge-trips.R:20-82): only device-days with
exactly one trip AND exactly one landing merge; everything else passes
through unjoined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import conditional_one_to_one_merge


def merge_trips(pds_trips: DataFrame, landings: DataFrame) -> DataFrame:
    """``pds_trips`` needs (imei, ended, ...); ``landings`` needs
    (pds_imei, landing_date, ...).  Landing date for a tracker trip is
    the date its track ended (R/merge-trips.R:42-45)."""
    trips = pds_trips.withColumn("landing_day", F.col("ended").cast("date")).withColumnRenamed(
        "imei", "device_imei"
    )
    surveys = landings.withColumn(
        "landing_day", F.col("landing_date").cast("date")
    ).withColumnRenamed("pds_imei", "device_imei")
    return conditional_one_to_one_merge(trips, surveys, ["landing_day", "device_imei"])
