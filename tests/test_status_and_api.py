from __future__ import annotations

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.plans import api_export, status_sync
from peskas_mozambique_data_pipeline_spark.plans import preprocess as pre
from peskas_mozambique_data_pipeline_spark.plans import validate as val


def test_status_sync_preserves_manual_decisions(spark):
    flags = spark.createDataFrame(
        [("s1", "12_bad_duration"), ("s2", None), ("s3", "2_zero_fishers"),
         ("s4", None), ("s5", "5_catch_gt_50kg")],
        "submission_id string, alert_flag string",
    )
    statuses = spark.createDataFrame(
        [
            ("s1", "validation_status_approved", "alice"),   # manual — keep
            ("s2", "validation_status_approved", "pipeline"),  # already approved
            ("s3", "not_validated", None),
            ("s4", "not_validated", "pipeline"),
            ("s5", "validation_status_not_approved", "pipeline"),  # unchanged
        ],
        "submission_id string, validation_status string, validated_by string",
    )
    to_approve, to_reject = status_sync.resolve_status_changes(flags, statuses)
    assert {r.submission_id for r in to_approve.collect()} == {"s4"}
    assert {r.submission_id for r in to_reject.collect()} == {"s3"}


def test_api_export_shapes(spark, tmp_path):
    validated = spark.createDataFrame(
        [("sub1", "2024-03-10 06:00:00", "Palma", "handline", 3.0, 6.0, 12.5,
          500.0, 0.694444, 27.777778, 40.0)],
        "submission_id string, landing_date string, district string, gear_type string, "
        "n_fishers double, trip_duration double, catch_kg double, catch_price double, "
        "cpue double, rpue double, price_per_kg double",
    ).withColumn("landing_date", F.to_timestamp("landing_date"))
    catch = spark.createDataFrame(
        [("sub1", 1, "SNA", 7.5, 4.0, 10.0), ("sub1", 2, "OCZ", 12.5, 2.0, 2.5)],
        "submission_id string, n_catch int, catch_taxon string, length double, "
        "n_individuals double, catch_kg double",
    )
    paths = api_export.export_api(validated, catch, str(tmp_path), git_sha="t")
    trips = spark.read.parquet(paths["trips"])
    assert trips.first().trip_id == "TRIP_sub1"
    assert trips.schema["n_fishers"].dataType.simpleString() == "int"
    catch_out = spark.read.parquet(paths["catch"])
    rows = {r.n_catch: r for r in catch_out.collect()}
    assert rows[1].tot_catch_kg == 12.5  # per-trip window total on every row
    assert rows[2].tot_catch_kg == 12.5


def test_manual_approval_bypasses_flags(spark):
    from peskas_mozambique_data_pipeline_spark.plans.validate import (
        apply_manual_overrides,
    )

    flags = spark.createDataFrame(
        [("s1", "5,12"), ("s2", None), ("s3", "8")],
        "submission_id string, alert_flag string",
    )
    approved = spark.createDataFrame([("s1",)], ["submission_id"])
    out = {r.submission_id: r.alert_flag for r in apply_manual_overrides(flags, approved).collect()}
    assert out == {"s1": None, "s2": None, "s3": "8"}
