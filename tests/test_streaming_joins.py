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


def test_left_outer_rows_drain_after_watermark_advances(spark, tmp_path):
    """Outer-side drain (VERDICT r12 Next #7): unmatched LEFT rows are
    held in state until the watermark closes their interval, then emit
    NULL-extended.  The fixture drives multiple availableNow runs over
    one checkpoint — each landing advances both sides' event time, so
    the global watermark passes left_ts + max_delay and the held rows
    flush."""
    lreq = str(tmp_path / "req")
    lres = str(tmp_path / "res")
    base = 1_700_000_000
    # five requests in the same second; responses for d0/d1 only
    req_schema = _land(
        spark, lreq,
        [(f"d{i}", base + i, f"req{i}") for i in range(5)],
        "device string, epoch long, req string",
    )
    res_schema = _land(
        spark, lres,
        [("d0", base + 30, "res0"), ("d1", base + 40, "res1")],
        "device string, epoch long, resp string",
    )
    reqs = si.stream_landing_zone(spark, lreq, req_schema).select(
        "device", F.timestamp_seconds("epoch").alias("ts"), "req"
    )
    ress = si.stream_landing_zone(spark, lres, res_schema).select(
        "device", F.timestamp_seconds("epoch").alias("r_ts"), "resp"
    )
    joined = sj.stream_stream_interval_join(
        reqs, ress, ["device"], max_delay="1 minute",
        watermark="1 minute", how="left_outer",
    )
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def drain():
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    # heartbeats on BOTH sides (the global watermark is the min across
    # inputs) push event time far past base + delay + watermark; a
    # watermark update only takes effect in the FOLLOWING micro-batch,
    # so iterate land→drain until the held rows appear
    nulls = set()
    for hop in range(1, 5):
        t = base + 3600 * hop
        _land(spark, lreq, [("hb", t, f"hbreq{hop}")],
              "device string, epoch long, req string")
        _land(spark, lres, [("hb2", t, f"hbres{hop}")],
              "device string, epoch long, resp string")
        drain()
        rows = spark.read.parquet(out_dir).collect()
        nulls = {r.device for r in rows if r.resp is None}
        if {"d2", "d3", "d4"} <= nulls:
            break
    assert {"d2", "d3", "d4"} <= nulls, nulls
    # the matched pairs emitted too, exactly once each
    matched = sorted(
        (r.device, r.req, r.resp)
        for r in spark.read.parquet(out_dir).collect()
        if r.resp is not None and r.device.startswith("d")
    )
    assert matched == [("d0", "req0", "res0"), ("d1", "req1", "res1")]
