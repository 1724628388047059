"""Stream-stream interval join: inner matches equal the batch interval
join, keys deduplicate to the left copy, unsupported modes raise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.streaming import ingest as si
from peskas_mozambique_data_pipeline_spark.streaming import joins as sj


def _land(spark, path, rows, schema):
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("append").parquet(path)
    return spark.read.parquet(path).schema


def test_inner_interval_join_matches_batch(spark, tmp_path):
    lreq = str(tmp_path / "req")
    lres = str(tmp_path / "res")
    base = 1_700_000_000
    # requests: device d{i%5}, one per minute
    req_rows = [
        (f"d{i % 5}", base + i * 60, f"req{i}") for i in range(40)
    ]
    # responses: same device, 0-3 min later (some beyond the 2-min cap)
    res_rows = [
        (f"d{i % 5}", base + i * 60 + (i % 4) * 60, f"res{i}")
        for i in range(40)
    ]
    req_schema = _land(
        spark, lreq,
        [(d, t, p) for d, t, p in req_rows],
        "device string, epoch long, req string",
    )
    res_schema = _land(
        spark, lres,
        [(d, t, p) for d, t, p in res_rows],
        "device string, epoch long, resp string",
    )
    reqs = si.stream_landing_zone(spark, lreq, req_schema).select(
        "device", F.timestamp_seconds("epoch").alias("ts"), "req"
    )
    ress = si.stream_landing_zone(spark, lres, res_schema).select(
        "device", F.timestamp_seconds("epoch").alias("r_ts"), "resp"
    )
    joined = sj.stream_stream_interval_join(
        reqs, ress, ["device"], max_delay="2 minutes",
        watermark="5 minutes",
    )
    out_dir = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.device, r.req, r.resp)
        for r in spark.read.parquet(out_dir).collect()
    }
    # batch twin: same keys + interval over the raw landing zones
    lb = spark.read.parquet(lreq).select(
        "device", F.timestamp_seconds("epoch").alias("ts"), "req"
    )
    rb = spark.read.parquet(lres).select(
        F.col("device").alias("rd"),
        F.timestamp_seconds("epoch").alias("r_ts"),
        "resp",
    )
    want = {
        (r.device, r.req, r.resp)
        for r in lb.join(
            rb,
            (lb.device == rb.rd)
            & (rb.r_ts >= lb.ts)
            & (rb.r_ts <= lb.ts + F.expr("INTERVAL 2 minutes")),
        ).collect()
    }
    assert got == want and len(got) > 20
    # the joined frame keeps exactly one device column
    assert joined.columns.count("device") == 1


def test_unsupported_modes_and_colliding_ts_raise(spark, tmp_path):
    lreq = str(tmp_path / "req")
    schema = _land(
        spark, lreq, [("d1", 1, "x")], "device string, epoch long, req string"
    )
    s1 = si.stream_landing_zone(spark, lreq, schema).select(
        "device", F.timestamp_seconds("epoch").alias("ts"), "req"
    )
    s2 = si.stream_landing_zone(spark, lreq, schema).select(
        "device", F.timestamp_seconds("epoch").alias("r_ts"), "req"
    )
    with pytest.raises(ValueError, match="coalescing"):
        sj.stream_stream_interval_join(s1, s2, ["device"], how="full_outer")
    with pytest.raises(ValueError, match="distinct"):
        sj.stream_stream_interval_join(
            s1, s1, ["device"], left_ts="ts", right_ts="ts"
        )
