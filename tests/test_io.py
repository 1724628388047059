from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.io import connectors, geojson, parquet_io


def test_versioned_write_and_read_latest(spark, tmp_path):
    zone = str(tmp_path / "zone")
    df1 = spark.createDataFrame([(1, "old")], ["k", "v"])
    df2 = spark.createDataFrame([(1, "new")], ["k", "v"])
    parquet_io.write_versioned(df1, zone, "landings", git_sha="aaa")
    time.sleep(1.1)  # version stamps have 1s resolution
    p2 = parquet_io.write_versioned(df2, zone, "landings", git_sha="bbb")
    assert parquet_io.latest_version_path(zone, "landings") == p2
    back = parquet_io.read_latest(spark, zone, "landings")
    assert back.first().v == "new"
    with pytest.raises(FileNotFoundError):
        parquet_io.latest_version_path(zone, "nope")


def test_jsonl_survey_source_and_uniqueness(spark, tmp_path):
    p = tmp_path / "dump.jsonl"
    p.write_text('{"_id": "a", "v": 1}\n{"_id": "b", "v": 2}\n')
    src = connectors.JsonlSurveySource(lambda asset: str(p))
    df = src.fetch_submissions(spark, "asset1")
    assert df.count() == 2
    connectors.assert_unique_ids(df)  # no raise
    dup = df.unionByName(df)
    with pytest.raises(ValueError, match="duplicate"):
        connectors.assert_unique_ids(dup)


def test_rest_batch_sink_batches_of_10(spark, tmp_path):
    sink_file = tmp_path / "batches.jsonl"

    def send(batch):
        with open(sink_file, "a") as f:
            f.write(json.dumps(len(batch)) + "\n")

    df = spark.createDataFrame([(i,) for i in range(23)], ["k"]).coalesce(1)
    connectors.RestBatchSink(send=send, batch_size=10).write(df)
    sizes = [json.loads(line) for line in sink_file.read_text().splitlines()]
    assert sorted(sizes, reverse=True) == [10, 10, 3]


def test_rate_limited_status_fetch(spark):
    def fetch(sid: str) -> dict:
        return {"validation_status": f"ok-{sid}"}

    df = spark.createDataFrame([("s1",), ("s2",)], ["submission_id"])
    out = connectors.rate_limited_status_fetch(df, fetch, n_workers=2, rate_limit_s=0.0)
    got = {r.submission_id: r.validation_status for r in out.collect()}
    assert got == {"s1": "ok-s1", "s2": "ok-s2"}


def test_document_sink_roundtrip(spark, tmp_path):
    sink = connectors.DocumentSink(str(tmp_path / "coll"))
    df = spark.createDataFrame([(1, "x")], ["k", "v"])
    sink.push(df)
    back = sink.pull(spark)
    assert back.count() == 1 and back.first().v == "x"


def test_geojson_read_and_attribute_join(spark, tmp_path):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"region": "cabo_delgado", "code": 1},
                "geometry": {"type": "Point", "coordinates": [40.0, -12.0]},
            },
            {
                "type": "Feature",
                "properties": {"region": "nampula", "code": 2},
                "geometry": {"type": "Point", "coordinates": [39.0, -15.0]},
            },
        ],
    }
    p = tmp_path / "regions.geojson"
    p.write_text(json.dumps(fc))
    geo = geojson.read_geojson_features(spark, str(p))
    assert geo.count() == 2
    assert "geometry_json" in geo.columns
    attrs = spark.createDataFrame([("cabo_delgado", 9.5)], ["region", "median_cpue"])
    joined = geojson.join_attributes(geo, attrs)
    got = {r.region: r.median_cpue for r in joined.collect()}
    assert got == {"cabo_delgado": 9.5, "nampula": None}


def test_reference_table_fallback(spark, tmp_path):
    # S15: API table load falls back to the packaged snapshot on failure
    packaged = tmp_path / "lw_fallback"
    spark.createDataFrame([("SNA", 0.02, 2.9)], "catch_taxon string, a double, b double") \
        .write.parquet(str(packaged))

    def load_reference(primary_path: str):
        try:
            return spark.read.parquet(primary_path)
        except Exception:
            return spark.read.parquet(str(packaged))

    df = load_reference(str(tmp_path / "missing"))
    assert df.first().catch_taxon == "SNA"


def test_latest_version_path_exact_prefix_only(spark, tmp_path):
    # "trips" must never resolve a "trips_extra" snapshot
    zone = str(tmp_path / "zone2")
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    p_trips = parquet_io.write_versioned(df, zone, "trips", git_sha="aaa")
    time.sleep(1.1)
    parquet_io.write_versioned(df, zone, "trips_extra", git_sha="bbb")
    assert parquet_io.latest_version_path(zone, "trips") == p_trips
