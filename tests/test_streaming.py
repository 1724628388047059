from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.streaming import ingest as si


@pytest.fixture()
def landing_dir(spark, tmp_path):
    src = str(tmp_path / "landing")
    rows = [
        (1, "2024-01-01 00:10:00", 10, "click", 1.0),
        (2, "2024-01-01 00:20:00", 11, "view", 2.0),
        (3, "2024-01-01 01:10:00", 10, "click", 3.0),
        (2, "2024-01-01 00:20:00", 11, "view", 2.0),  # duplicate id
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.parquet(src)
    return src


def test_streaming_arrival_stats_available_now(spark, landing_dir, tmp_path):
    schema = spark.read.parquet(landing_dir).schema
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_batch():
        stream = si.stream_landing_zone(spark, landing_dir, schema)
        assert stream.isStreaming
        stats = si.arrival_stats(stream, window="1 hour")
        q = si.write_zone(stats, out_dir, ckpt)
        q.awaitTermination(120)

    # batch 1 ingests the backlog; in append mode windowed results emit
    # only once the watermark passes the window, so a later batch (the
    # next cron-replacement run) closes the earlier windows
    run_batch()
    late = spark.createDataFrame(
        [(99, "2024-01-01 06:00:00", 12, "click", 9.0)],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    late.coalesce(1).write.mode("append").parquet(landing_dir)
    run_batch()

    got = {
        (str(r.window_start), r.event_type): r.n_events
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got[("2024-01-01 00:00:00", "click")] == 1
    assert got[("2024-01-01 00:00:00", "view")] == 2
    assert got[("2024-01-01 01:00:00", "click")] == 1


def test_streaming_dedup_within_watermark(spark, landing_dir, tmp_path):
    schema = spark.read.parquet(landing_dir).schema
    stream = si.stream_landing_zone(spark, landing_dir, schema)
    deduped = si.streaming_dedup(stream, ["event_id"])
    out_dir, ckpt = str(tmp_path / "dedup"), str(tmp_path / "dckpt")
    q = si.write_zone(deduped, out_dir, ckpt)
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    assert out.count() == 3  # 4 rows, one duplicate event_id dropped
