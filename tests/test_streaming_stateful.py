from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.streaming import ingest as si
from peskas_mozambique_data_pipeline_spark.streaming.stateful import running_user_stats


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("append").parquet(path)


def test_stateful_running_stats_across_batches(spark, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, [(1, "2024-01-01 00:00:00", 2.0),
                              (1, "2024-01-01 00:05:00", 3.0),
                              (2, "2024-01-01 00:06:00", 1.0)])
    schema = spark.read.parquet(src).schema

    def run_once():
        stream = spark.readStream.format("parquet").schema(schema).load(src)
        stats = running_user_stats(stream)
        # file sinks don't take update mode: foreachBatch is the
        # documented pattern for stateful-update output to files
        q = (
            stats.writeStream.foreachBatch(
                lambda df, epoch: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # second batch arrives later; state must carry over via checkpoint
    _write_batch(spark, src, [(1, "2024-01-01 01:00:00", 5.0)])
    run_once()

    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:  # keep the latest emission per user
        if r.user_id not in latest or r.n_events > latest[r.user_id].n_events:
            latest[r.user_id] = r
    assert latest[1].n_events == 3 and latest[1].total_value == 10.0
    assert str(latest[1].last_seen) == "2024-01-01 01:00:00"
    assert latest[2].n_events == 1 and latest[2].total_value == 1.0


def test_trip_segments_event_time_timeout(spark, tmp_path):
    # device 10's pings stop; a later ping from device 20 advances the
    # watermark past (last ping + gap) and the engine fires the
    # event-time timeout: device 10's trip emits once and state evicts
    from peskas_mozambique_data_pipeline_spark.streaming.stateful import trip_segments

    src = str(tmp_path / "pings")
    out = str(tmp_path / "trips")
    ckpt = str(tmp_path / "ckpt2")

    def write_pings(rows):
        df = spark.createDataFrame(rows, "device_id long, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        df.coalesce(1).write.mode("append").parquet(src)

    write_pings([(10, "2024-01-01 00:00:00"), (10, "2024-01-01 00:05:00")])
    schema = spark.read.parquet(src).schema

    def run_once():
        stream = spark.readStream.format("parquet").schema(schema).load(src)
        trips = trip_segments(stream, gap_minutes=30, watermark="10 minutes")
        q = (
            trips.writeStream.foreachBatch(
                lambda df, epoch: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # batch 1: trip open, nothing emitted yet
    # batch 2: unrelated device far in the future -> watermark advances
    write_pings([(20, "2024-01-01 02:00:00")])
    run_once()
    # batch 3: another advance so any lagging timeout fires
    write_pings([(20, "2024-01-01 04:00:00")])
    run_once()

    import os

    rows = (
        spark.read.parquet(out).collect()
        if any(f.endswith(".parquet") for f in os.listdir(out))
        else []
    )
    trips10 = [r for r in rows if r.device_id == 10]
    assert len(trips10) == 1  # exactly one finalized trip, emitted once
    t = trips10[0]
    assert t.n_events == 2
    assert str(t.trip_start) == "2024-01-01 00:00:00"
    assert str(t.trip_end) == "2024-01-01 00:05:00"


def test_streaming_anomaly_flags_cross_batch_baseline(spark, tmp_path):
    from peskas_mozambique_data_pipeline_spark.streaming.stateful import anomaly_flags

    src = str(tmp_path / "vals")
    out = str(tmp_path / "anoms")
    ckpt = str(tmp_path / "ckpt3")
    # batch 1: 10 calm readings alternating 10/12 -> establishes baseline
    _write_batch(
        spark,
        src,
        [(1, f"2024-01-01 00:{i:02d}:00", 10.0 if i % 2 == 0 else 12.0) for i in range(10)],
    )
    schema = spark.read.parquet(src).schema

    def run_once():
        stream = spark.readStream.format("parquet").schema(schema).load(src)
        q = (
            anomaly_flags(stream, threshold=3.0, min_obs=8)
            .writeStream.foreachBatch(
                lambda df, epoch: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # batch 2: a spike plus one more calm reading — only the spike flags,
    # and it scores against state carried over from batch 1
    _write_batch(
        spark,
        src,
        [(1, "2024-01-01 01:00:00", 100.0), (1, "2024-01-01 01:01:00", 11.0)],
    )
    run_once()

    rows = spark.read.parquet(out).collect() if spark.read.parquet(out).count() else []
    assert len(rows) == 1
    r = rows[0]
    assert r.value == 100.0 and r.n_prior == 10 and r.zscore > 10
    # calm readings never flagged; the spike IS in the baseline afterwards
    # (n_prior counted only strictly-prior events)


def test_stream_token_drift_cross_batch_and_batch_equivalence(spark, tmp_path):
    """Streaming drift monitor: (a) state accumulates across
    micro-batches through the checkpoint, (b) the final KL equals a
    python recomputation over the SAME binned arithmetic (additive
    state => batch/stream equivalence), (c) a group matching the
    reference scores ~0 while a shifted group scores well above it."""
    import math

    from peskas_mozambique_data_pipeline_spark.streaming.stateful import (
        _drift_bin,
        binned_reference,
        stream_token_drift,
    )

    src = str(tmp_path / "tok")
    out = str(tmp_path / "drift")
    ckpt = str(tmp_path / "ckpt3")

    # reference: uniform over 4 tokens
    ref = {t: 0.25 for t in ["alpha", "beta", "gamma", "delta"]}
    match = ["alpha", "beta", "gamma", "delta"] * 3   # matches ref
    shifted = ["zeta"] * 10 + ["alpha", "beta"]       # mass off-reference

    def write(rows):
        spark.createDataFrame(rows, "grp string, token string").coalesce(
            1
        ).write.mode("append").parquet(src)

    write([("m", t) for t in match[:6]] + [("s", t) for t in shifted[:6]])
    schema = spark.read.parquet(src).schema

    def run_once():
        stream = spark.readStream.format("parquet").schema(schema).load(src)
        drift = stream_token_drift(stream, ref, n_bins=64)
        q = (
            drift.writeStream.foreachBatch(
                lambda df, epoch: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    write([("m", t) for t in match[6:]] + [("s", t) for t in shifted[6:]])
    run_once()

    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:
        if r.grp not in latest or r.n_tokens > latest[r.grp].n_tokens:
            latest[r.grp] = r
    assert latest["m"].n_tokens == len(match)
    assert latest["s"].n_tokens == len(shifted)

    # python twin over the same binned arithmetic
    n_bins, eps = 64, 1e-9
    refb = binned_reference(ref, n_bins)
    q_ = [(refb[j] + eps) / (1.0 + eps * n_bins) for j in range(n_bins)]

    def py_kl(toks):
        counts = [0] * n_bins
        for t in toks:
            counts[_drift_bin(t, n_bins)] += 1
        total = sum(counts)
        return sum(
            (c / total) * math.log((c / total) / q_[j])
            for j, c in enumerate(counts)
            if c
        )

    assert abs(latest["m"].kl_to_ref - py_kl(match)) < 1e-12
    assert abs(latest["s"].kl_to_ref - py_kl(shifted)) < 1e-12
    # the signal: matching group ~0, shifted group clearly above
    assert latest["m"].kl_to_ref < 0.1
    assert latest["s"].kl_to_ref > 1.0


def test_jvm_binning_matches_python_drift_bin(spark):
    """The JVM md5-bin expression inside stream_token_drift must equal
    the python _drift_bin that bins the reference distribution — if
    they diverge, group histograms and reference mass land in
    different bins silently."""
    from pyspark.sql import functions as F

    from peskas_mozambique_data_pipeline_spark.streaming.stateful import _drift_bin

    toks = ["alpha", "beta", "zeta", "", "café", "0", "the quick"]
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    for n_bins in (64, 256):
        got = {
            r.token: r.b
            for r in df.select(
                "token",
                (
                    F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10)
                    .cast("long") % n_bins
                ).cast("int").alias("b"),
            ).collect()
        }
        for t in toks:
            assert got[t] == _drift_bin(t, n_bins), (t, n_bins)


def test_binned_kl_lower_bounds_token_grain_kl():
    """The log-sum inequality claim behind stream_token_drift: for any
    token distribution p and reference q (q covering p's support),
    KL of the md5-binned distributions never exceeds token-grain KL.
    Pure python — no Spark needed."""
    import math
    import random

    from peskas_mozambique_data_pipeline_spark.streaming.stateful import (
        _drift_bin,
        binned_reference,
    )

    rng = random.Random(13)
    vocab = [f"tok{i}" for i in range(60)]
    for n_bins in (8, 32):
        for _ in range(20):
            # random group counts over a subset; ref covers ALL vocab
            toks = rng.sample(vocab, rng.randint(5, 40))
            counts = {t: rng.randint(1, 50) for t in toks}
            total = sum(counts.values())
            ref_raw = {t: rng.random() + 0.01 for t in vocab}
            z = sum(ref_raw.values())
            ref = {t: v / z for t, v in ref_raw.items()}

            token_kl = sum(
                (c / total) * math.log((c / total) / ref[t])
                for t, c in counts.items()
            )
            binned_c = [0] * n_bins
            for t, c in counts.items():
                binned_c[_drift_bin(t, n_bins)] += c
            q = binned_reference(ref, n_bins)  # eps=0 path: ref covers all
            binned_kl = sum(
                (c / total) * math.log((c / total) / q[j])
                for j, c in enumerate(binned_c)
                if c
            )
            assert binned_kl <= token_kl + 1e-12, (n_bins, binned_kl, token_kl)
