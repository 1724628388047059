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


# ---------------------------------------------------------------------------
# StreamSource abstraction: plans are source-agnostic


@pytest.mark.parametrize("fmt", ["parquet", "json"])
def test_arrival_stats_parameterized_over_file_sources(spark, tmp_path, fmt):
    from peskas_mozambique_data_pipeline_spark.streaming import sources as ss

    rows = [
        (1, "2024-01-01 00:10:00", 10, "click", 1.0),
        (2, "2024-01-01 00:20:00", 11, "view", 2.0),
        (3, "2024-01-01 06:00:00", 10, "click", 3.0),  # closes window 0
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    src_dir = str(tmp_path / f"landing_{fmt}")
    df.coalesce(1).write.format(fmt).save(src_dir)

    source = ss.FileStreamSource(src_dir, df.schema, fmt=fmt)
    stream = source.read_stream(spark)
    assert stream.isStreaming
    stats = si.arrival_stats(stream, window="1 hour")
    out_dir, ckpt = str(tmp_path / f"out_{fmt}"), str(tmp_path / f"ckpt_{fmt}")
    q = si.write_zone(stats, out_dir, ckpt)
    q.awaitTermination(120)
    got = {
        (str(r.window_start), r.event_type): r.n_events
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got[("2024-01-01 00:00:00", "click")] == 1
    assert got[("2024-01-01 00:00:00", "view")] == 1


def test_rate_source_events_shape(spark):
    from peskas_mozambique_data_pipeline_spark.streaming import sources as ss

    stream = ss.RateStreamSource(
        rows_per_second=5, project=ss.rate_as_events
    ).read_stream(spark)
    assert stream.isStreaming
    assert stream.columns == ["event_id", "ts", "user_id", "event_type", "value"]
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_kafka_source_options_and_decode(spark):
    import json as _json

    from peskas_mozambique_data_pipeline_spark.streaming import sources as ss

    schema = spark.createDataFrame(
        [], "event_id long, event_type string, value double"
    ).schema
    src = ss.KafkaStreamSource(
        "broker1:9092,broker2:9092",
        "events",
        schema,
        extra_options={"maxOffsetsPerTrigger": "5000"},
    )
    assert src.reader_options() == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "events",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "5000",
    }
    # decode is a plain column expression — verify it on a batch frame
    raw = spark.createDataFrame(
        [(_json.dumps({"event_id": 7, "event_type": "click", "value": 1.5}).encode(),)],
        "value binary",
    )
    got = src.decode(raw).first()
    assert (got.event_id, got.event_type, got.value) == (7, "click", 1.5)


def test_stream_to_versioned_zone_idempotent_batches(spark, landing_dir, tmp_path):
    schema = spark.read.parquet(landing_dir).schema
    zone = str(tmp_path / "zone")
    ckpt = str(tmp_path / "zc")

    stream = si.stream_landing_zone(spark, landing_dir, schema)
    q, path = si.stream_to_versioned_zone(stream, zone, "events", ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(path)
    n1 = first.count()
    assert n1 == 4  # full backlog landed
    assert "batch" in first.columns  # partitioned by batch id

    # restart on the SAME checkpoint reuses the SAME version dir (the
    # sidecar pins it) — a crash-restart replay overwrites its own
    # batch dir instead of duplicating rows into a fresh version
    late = spark.createDataFrame(
        [(50, "2024-01-01 09:00:00", 13, "view", 5.0)],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    late.coalesce(1).write.mode("append").parquet(landing_dir)
    stream2 = si.stream_landing_zone(spark, landing_dir, schema)
    q2, path2 = si.stream_to_versioned_zone(stream2, zone, "events", ckpt)
    q2.awaitTermination(120)
    assert path2 == path  # stable across restarts of one checkpoint
    assert spark.read.parquet(path).count() == n1 + 1  # new batch appended
    assert si.read_stream_zone(spark, zone, "events").count() == n1 + 1

    # a NEW checkpoint = a new logical run = a fresh zone version; the
    # zone as a whole is the union of incremental versions
    import time as _time

    _time.sleep(1.1)  # versioned_name has second granularity
    late2 = spark.createDataFrame(
        [(51, "2024-01-01 10:00:00", 14, "view", 6.0)],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    late2.coalesce(1).write.mode("append").parquet(landing_dir)
    stream3 = si.stream_landing_zone(spark, landing_dir, schema)
    q3, path3 = si.stream_to_versioned_zone(
        stream3, zone, "events", str(tmp_path / "zc2")
    )
    q3.awaitTermination(120)
    assert path3 != path
    # the fresh checkpoint re-reads the full backlog into its version;
    # each version is internally exactly-once
    assert spark.read.parquet(path3).count() == n1 + 2


@pytest.mark.slow
def test_streaming_soak_bounded_state(spark, tmp_path):
    """Trigger-interval soak: simulated hours of event time through
    arrival_stats + the foreachBatch zone sink.  The watermark must
    EVICT closed windows — state store rows stay bounded while total
    input grows, the property that keeps an unbounded stream runnable
    at 100 TB."""
    import time

    from peskas_mozambique_data_pipeline_spark.streaming import sources as ss

    src = ss.RateMicroBatchSource(
        rows_per_batch=200,
        start_timestamp_ms=1704067200000,  # 2024-01-01T00:00Z
        advance_millis_per_batch=30 * 60 * 1000,  # 30 simulated min/batch
        num_partitions=2,
        project=ss.rate_as_events,
    )
    stats = si.arrival_stats(
        src.read_stream(spark), window="1 hour", watermark="1 hour"
    )
    q, path = si.stream_to_versioned_zone(
        stats,
        str(tmp_path / "zone"),
        "arrivals",
        str(tmp_path / "soak_ck"),
        available_now=False,  # continuous micro-batches, not a drain
    )
    try:
        deadline = time.time() + 180
        while time.time() < deadline:
            p = q.lastProgress
            if p and p.get("batchId", 0) >= 14:  # ~7 simulated hours
                break
            time.sleep(0.5)
        progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    finally:
        q.stop()

    state_rows = [p["stateOperators"][0]["numRowsTotal"] for p in progresses]
    inputs = sum(p["numInputRows"] for p in progresses)
    assert len(state_rows) >= 8  # a real soak, not two batches
    assert inputs >= 1600
    # live state = windows not yet past (window end + watermark): at
    # 30 min/batch that is <=4-5 open 1h windows x 2 event types; a
    # leak (no eviction) would grow past this within 14 batches
    assert max(state_rows) <= 24, f"state grew unbounded: {state_rows}"
    # finalized (watermark-closed) windows landed through foreachBatch
    landed = spark.read.parquet(path)
    assert landed.count() > 0
    assert {"window_start", "window_end", "event_type", "n_events"} <= set(
        landed.columns
    )


def test_stream_interval_join_matches_batch_operator(spark, tmp_path):
    """The watermarked stream-stream interval join must produce the
    batch interval_join's pair set once all data has flowed through
    (no late rows here, so the watermark drops nothing)."""
    from peskas_mozambique_data_pipeline_spark.operators.joins import interval_join

    clicks = [
        (1, 10, "2024-01-01 00:00:00"),
        (2, 10, "2024-01-01 05:00:00"),
        (3, 11, "2024-01-01 00:30:00"),
    ]
    views = [
        (101, 10, "2024-01-01 00:40:00"),   # within 1h of click 1
        (102, 10, "2024-01-01 05:30:00"),   # within 1h of click 2
        (103, 10, "2024-01-01 03:00:00"),   # matches nothing
        (104, 11, "2024-01-01 01:00:00"),   # within 1h of click 3
    ]
    cdf = spark.createDataFrame(
        clicks, "click_id long, user_id long, c_ts string"
    ).withColumn("c_ts", F.to_timestamp("c_ts"))
    vdf = spark.createDataFrame(
        views, "view_id long, user_id long, v_ts string"
    ).withColumn("v_ts", F.to_timestamp("v_ts"))
    cdir, vdir = str(tmp_path / "c"), str(tmp_path / "v")
    cdf.coalesce(1).write.parquet(cdir)
    vdf.coalesce(1).write.parquet(vdir)

    cs = si.stream_landing_zone(spark, cdir, cdf.schema)
    vs = si.stream_landing_zone(spark, vdir, vdf.schema)
    joined = si.stream_interval_join(
        cs, vs, on="user_id", left_ts="c_ts", right_ts="v_ts",
        lower="0 seconds", upper="1 hour", watermark="10 minutes",
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r.click_id, r.view_id) for r in spark.read.parquet(out).collect()
    }

    batch = {
        (r.click_id, r.view_id)
        for r in interval_join(
            vdf,
            cdf.withColumn("c_end", F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
            point_col="v_ts", start_col="c_ts", end_col="c_end",
            by=["user_id"], bin_seconds=3600,
        ).collect()
    }
    assert streamed == batch == {(1, 101), (2, 102), (3, 104)}


def test_stream_interval_join_rejects_column_overlap(spark, tmp_path):
    cdf = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:00")], "a long, user_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    d = str(tmp_path / "x")
    cdf.coalesce(1).write.parquet(d)
    s1 = si.stream_landing_zone(spark, d, cdf.schema)
    s2 = si.stream_landing_zone(spark, d, cdf.schema)
    with pytest.raises(ValueError, match="rename first"):
        si.stream_interval_join(s1, s2, on="user_id", left_ts="ts", right_ts="ts")


def test_stream_sessions_matches_batch_sessionization(spark, tmp_path):
    """Streaming session_window must emit, over all micro-batches, the
    SAME sessions the batch twin computes on the full data — the
    batch↔streaming equivalence rule every streaming op here follows."""
    rows = [
        # user 10: two sessions (40-min gap splits them)
        (1, "2024-01-01 00:00:00", 10, "click", 1.5),
        (2, "2024-01-01 00:10:00", 10, "click", 2.5),
        (3, "2024-01-01 00:50:00", 10, "view", 4.0),
        # user 11: one session
        (4, "2024-01-01 00:05:00", 11, "view", 10.0),
    ]
    schema_s = "event_id long, ts string, user_id long, event_type string, value double"
    landing = str(tmp_path / "landing")
    df = spark.createDataFrame(rows, schema_s).withColumn(
        "ts", F.to_timestamp("ts")
    )
    df.coalesce(1).write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    out_dir, ckpt = str(tmp_path / "sess"), str(tmp_path / "sckpt")

    def run_batch():
        stream = si.stream_landing_zone(spark, landing, schema)
        sess = si.stream_sessions(stream, gap="30 minutes")
        q = si.write_zone(sess, out_dir, ckpt)
        q.awaitTermination(120)

    run_batch()
    # append mode holds sessions until the watermark passes; a later
    # event advances it and closes the earlier sessions
    late = spark.createDataFrame(
        [(99, "2024-01-01 06:00:00", 12, "click", 0.0)], schema_s
    ).withColumn("ts", F.to_timestamp("ts"))
    late.coalesce(1).write.mode("append").parquet(landing)
    run_batch()

    got = {
        (r.user_id, str(r.session_start)): (r.n_events, r.session_value)
        for r in spark.read.parquet(out_dir).collect()
    }
    # batch twin on the same rows (the registry query's aggregates)
    batch = (
        df.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("v"),
        )
        .select("user_id", F.col("w.start").alias("s"), "n", "v")
        .collect()
    )
    expect = {(r.user_id, str(r.s)): (r.n, r.v) for r in batch}
    assert expect == got
    assert got[(10, "2024-01-01 00:00:00")] == (2, 4.0)
    assert got[(10, "2024-01-01 00:50:00")] == (1, 4.0)


def test_stream_bloom_decontaminate_matches_batch(spark, tmp_path):
    """Streaming bloom decontamination (stateless: broadcast bitmask
    probe + row-local exact map verify) must keep exactly the docs the
    batch exact operator keeps."""
    import random

    from peskas_mozambique_data_pipeline_spark.operators.text import decontaminate

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]
    bench_rows = [
        (100 + i, " ".join(rng.choice(vocab) for _ in range(10)))
        for i in range(3)
    ]
    train_rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(15))) for i in range(25)
    ]
    planted = bench_rows[1][1].split()[1:6]
    train_rows[4] = (4, "x " + " ".join(planted) + " y")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    train = spark.createDataFrame(train_rows, "doc_id long, text string")

    src = str(tmp_path / "docs_landing")
    train.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = si.stream_landing_zone(spark, src, schema)
    clean_stream = si.stream_bloom_decontaminate(
        stream, bench, n=5, n_words=4, k=2
    )
    assert clean_stream.isStreaming
    out_dir, ckpt = str(tmp_path / "clean"), str(tmp_path / "ckpt_dec")
    q = (
        clean_stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    expect = {r.doc_id for r in decontaminate(train, bench, n=5).collect()}
    assert got == expect
    assert 4 not in got  # the planted contaminated doc is dropped
    # schema passthrough: no helper columns leak
    assert set(spark.read.parquet(out_dir).columns) == {"doc_id", "text"}


def test_stream_bloom_prefilter_only_never_false_negative(spark, tmp_path):
    """With exact_verify=False the prefilter may drop clean docs
    (bloom FPs) but must NEVER pass a contaminated one."""
    from peskas_mozambique_data_pipeline_spark.operators.text import decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    rows = [(1, "alpha beta gamma pad pad"), (2, "clean words only here now")]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "docs2")
    train.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = si.stream_landing_zone(spark, src, schema)
    clean_stream = si.stream_bloom_decontaminate(
        stream, bench, n=3, n_words=1, k=2, exact_verify=False
    )
    out_dir, ckpt = str(tmp_path / "clean2"), str(tmp_path / "ckpt2")
    q = (
        clean_stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    exact_clean = {r.doc_id for r in decontaminate(train, bench, n=3).collect()}
    assert got <= exact_clean  # prefilter output ⊆ truly-clean set
    assert 1 not in got


def test_streaming_image_stats_matches_batch(spark, tmp_path):
    """The PNG featurizer is a stateless mapInPandas, so the SAME
    operator runs unchanged in a streaming plan (the multimodal entry
    in the batch<->streaming symmetry table): per-asset stats from the
    stream equal the batch run bit-for-bit."""
    from peskas_mozambique_data_pipeline_spark.operators import multimodal
    from test_multimodal import _checkerboard, _png_encode

    import numpy as np

    rng = np.random.RandomState(3)
    blobs = [
        (1, "image", bytearray(_png_encode(_checkerboard(8, 8), 0))),
        (2, "image", bytearray(_png_encode(
            rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8), 2))),
        (3, "image", bytearray(b"not a png")),  # skipped in both modes
        (4, "audio", bytearray(b"\x00" * 64)),  # filtered in both modes
    ]
    src = str(tmp_path / "media")
    df = spark.createDataFrame(
        blobs, "asset_id long, media_type string, content binary"
    )
    df.coalesce(1).write.parquet(src)

    batch = {
        r.asset_id: r for r in multimodal.image_stats(
            spark.read.parquet(src)).collect()
    }

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        multimodal.image_stats(stream)
        .writeStream.format("parquet")
        .option("path", out_dir).option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r.asset_id: r for r in spark.read.parquet(out_dir).collect()
    }
    assert set(streamed) == set(batch) == {1, 2}
    for aid in batch:
        assert streamed[aid] == batch[aid], aid
