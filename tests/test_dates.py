from __future__ import annotations

import datetime
import re

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.functions.dates import (
    duration_hours,
    month_floor,
    month_spine,
    to_iso_string,
    version_stamp,
)


def test_month_floor_and_spine(spark):
    df = spark.createDataFrame(
        [("2024-03-15 13:45:00", "2024-06-02 01:00:00")], "a string, b string"
    ).select(F.to_timestamp("a").alias("a"), F.to_timestamp("b").alias("b"))
    row = df.select(
        month_floor("a").alias("m"),
        month_spine(F.col("a"), F.col("b")).alias("spine"),
    ).first()
    assert row.m == datetime.date(2024, 3, 1)
    assert row.spine == [
        datetime.date(2024, 3, 1), datetime.date(2024, 4, 1),
        datetime.date(2024, 5, 1), datetime.date(2024, 6, 1),
    ]


def test_duration_hours_fractional(spark):
    df = spark.createDataFrame(
        [("2024-01-01 06:00:00", "2024-01-01 07:30:00")], "s string, e string"
    ).select(F.to_timestamp("s").alias("s"), F.to_timestamp("e").alias("e"))
    assert df.select(duration_hours("s", "e").alias("d")).first().d == 1.5


def test_to_iso_string(spark):
    df = spark.createDataFrame([("2024-01-02 03:04:05",)], "t string").select(
        F.to_timestamp("t").alias("t")
    )
    assert df.select(to_iso_string("t").alias("s")).first().s == "2024-01-02T03:04:05Z"


def test_version_stamp_shape():
    assert re.fullmatch(r"landings__\d{14}_abc123__", version_stamp("landings", "abc123"))
