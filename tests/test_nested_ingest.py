"""S4 end-to-end: nested Kobo-style JSON submissions → spark.read.json
→ struct flattening + ArrayType repeat-group explode — the idiomatic
alternative to the reference's recursive column-name mangling
(R/ingestion.R:149-218)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.io.connectors import (
    JsonlSurveySource,
    assert_unique_ids,
)
from peskas_mozambique_data_pipeline_spark.operators.reshape import explode_repeat_group

SUBMISSIONS = [
    {
        "_id": "n1",
        "general": {"landing_date": "2024-03-10T06:00:00", "district": "palma"},
        "trip": {"gear_type": "handline", "duration": 6.0},
        "species_group": [
            {"species": "SNA", "n_individuals": 4, "length_range": "5_10"},
            {"species": "OCZ", "n_individuals": 2, "length_range": "10_15"},
        ],
    },
    {
        "_id": "n2",
        "general": {"landing_date": "2024-03-11T07:00:00", "district": "quissanga"},
        "trip": {"gear_type": "gillnet", "duration": 4.5},
        "species_group": [],
    },
]


def test_nested_json_ingest_and_explode(spark, tmp_path):
    p = tmp_path / "kobo_dump.jsonl"
    p.write_text("\n".join(json.dumps(s) for s in SUBMISSIONS))

    src = JsonlSurveySource(lambda asset: str(p))
    raw = src.fetch_submissions(spark, "asset")
    assert_unique_ids(raw)

    # struct access replaces the reference's name-mangling flatten
    flat = raw.select(
        F.col("_id").alias("submission_id"),
        F.to_timestamp("general.landing_date").alias("landing_date"),
        F.col("general.district").alias("district"),
        F.col("trip.gear_type").alias("gear_type"),
        F.col("trip.duration").alias("trip_duration"),
        "species_group",
    )
    catch = explode_repeat_group(flat, "species_group", "n_catch")
    rows = sorted(
        (r.submission_id, r.n_catch, r.species, r.n_individuals)
        for r in catch.collect()
        if r.species is not None
    )
    assert rows == [("n1", 1, "SNA", 4), ("n1", 2, "OCZ", 2)]
    # empty repeat group: the submission survives (outer explode)
    n2 = catch.filter(F.col("submission_id") == "n2").collect()
    assert len(n2) == 1 and n2[0].species is None
    assert n2[0].gear_type == "gillnet"
