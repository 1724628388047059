"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windowed aggregations (streaming/ingest.py) cover the
reference's cron-replacement needs; this module adds the escape hatch
for operator semantics Spark doesn't ship: arbitrary per-key state kept
by the engine's state store, updated batch-by-batch with pandas.

Example operator: a per-user running activity accumulator — total
events, total value, and last-seen timestamp, re-emitted on every
update (the shape a per-device trip segmenter or online quality
monitor would take).

Scale: state is partitioned by key across executors; each micro-batch
touches only keys present in the batch plus timed-out state.  State
size is bounded by key cardinality × state row width, independent of
stream length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RUNNING_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen", TimestampType()),
    ]
)

RUNNING_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen_us", LongType()),
    ]
)


def _update_running(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running totals with engine-managed state.

    Input stream needs (user_id, ts, value).  Emits one updated row per
    user per micro-batch ('update' semantics over the state store).
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRIP_OUTPUT_SCHEMA = StructType(
    [
        StructField("device_id", LongType()),
        StructField("n_events", LongType()),
        StructField("trip_start", TimestampType()),
        StructField("trip_end", TimestampType()),
    ]
)

TRIP_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
    ]
)


def trip_segments(
    stream: DataFrame, gap_minutes: int = 30, watermark: str = "10 minutes"
) -> DataFrame:
    """Per-device trip segmentation with an EVENT-TIME TIMEOUT — the
    streaming form of the reference's PDS trip matching
    (R/merge-trips.R): pings accumulate per device, and a trip
    finalizes when the watermark passes ``last ping + gap_minutes``
    with no new data, emitting exactly one row per completed trip
    ('append' semantics) and clearing the key's state.

    This is the state-eviction pattern ``running_user_stats`` doesn't
    need: without a timeout, an abandoned device would hold state
    forever; here the engine calls the function with ``hasTimedOut``
    once the watermark guarantees no more pings can arrive for the gap.

    Scale: state per live device only (finished trips evict), timeout
    scans are per-partition in the state store; late pings beyond the
    watermark are dropped by the engine before the operator runs.
    """

    def segment(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, start_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "device_id": [key[0]],
                    "n_events": [n],
                    "trip_start": [pd.Timestamp(start_us, unit="us")],
                    "trip_end": [pd.Timestamp(last_us, unit="us")],
                }
            )
            return
        n, start_us, last_us = state.get if state.exists else (0, 0, 0)
        for pdf in batches:
            if len(pdf):
                us = pdf["ts"].astype("int64") // 1000
                n += len(pdf)
                lo, hi = int(us.min()), int(us.max())
                start_us = lo if start_us == 0 else min(start_us, lo)
                last_us = max(last_us, hi)
        state.update((n, start_us, last_us))
        # event-time timeout takes epoch milliseconds; must exceed the
        # current watermark (guaranteed: last ping is ahead of it)
        state.setTimeoutTimestamp(last_us // 1000 + gap_minutes * 60_000)

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("device_id")
        .applyInPandasWithState(
            segment,
            outputStructType=TRIP_OUTPUT_SCHEMA,
            stateStructType=TRIP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


ANOMALY_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("n_prior", LongType()),
        StructField("zscore", DoubleType()),
    ]
)

ANOMALY_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)


def anomaly_flags(
    stream: DataFrame, threshold: float = 3.0, min_obs: int = 8
) -> DataFrame:
    """Streaming per-key anomaly detection — the online twin of
    ``operators/timeseries.rolling_zscore``: each event is scored
    against the RUNNING mean/variance of the key's STRICTLY-PRIOR
    events (Welford accumulation), then folded into the state.  Like
    the batch operator, an anomaly never dilutes its own baseline;
    unlike it, the baseline is all history rather than a trailing
    window — state per key is three numbers (n, mean, M2), not a
    buffer, which is what makes unbounded streams affordable.

    Rows inside a micro-batch are folded in event-time order (id
    tie-break), so replaying the same batches yields the same flags
    regardless of partitioning.  Emits ONLY flagged events
    (|z| ≥ threshold once the key has ``min_obs`` prior events).
    """

    def update(key, batches, state: GroupState):
        import math

        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        flagged: list[dict] = []
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "value"])
            for ts, v in zip(pdf["ts"], pdf["value"]):
                v = float(v)
                if n >= min_obs:
                    var = m2 / n
                    if var > 0:
                        z = (v - mean) / math.sqrt(var)
                        if abs(z) >= threshold:
                            flagged.append(
                                {
                                    "user_id": key[0],
                                    "ts": ts,
                                    "value": v,
                                    "n_prior": n,
                                    "zscore": z,
                                }
                            )
                n += 1
                d = v - mean
                mean += d / n
                m2 += d * (v - mean)
        state.update((n, mean, m2))
        if flagged:
            yield pd.DataFrame(flagged)

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DRIFT_OUTPUT_SCHEMA = StructType(
    [
        StructField("grp", StringType()),
        StructField("n_tokens", LongType()),
        StructField("kl_to_ref", DoubleType()),
    ]
)

DRIFT_STATE_SCHEMA = StructType(
    [StructField("counts", ArrayType(LongType()))]
)


def _drift_bin(token: str, n_bins: int) -> int:
    """md5-based bin — the same deterministic-hash convention as
    ``operators/sketches.py`` (portable, seed-free)."""
    import hashlib

    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % n_bins


def binned_reference(ref_probs: dict[str, float], n_bins: int = 256) -> list[float]:
    """Fold a token→probability reference distribution into the fixed
    bin space the streaming monitor accumulates in."""
    out = [0.0] * n_bins
    for tok, p in ref_probs.items():
        out[_drift_bin(tok, n_bins)] += float(p)
    return out


def stream_token_drift(
    stream: DataFrame,
    ref_probs: dict[str, float],
    group_col: str = "grp",
    token_col: str = "token",
    n_bins: int = 256,
    eps: float = 1e-9,
) -> DataFrame:
    """Streaming per-group token-distribution drift — the online twin
    of ``operators/curation.token_distribution_drift``: each group's
    RUNNING token distribution is scored (KL) against a fixed reference
    distribution, re-emitted on every micro-batch.

    The batch operator compares per-group vs whole-corpus exactly at
    token grain; exact token-grain state on a stream is VOCAB-SIZED
    (unbounded).  The affordable state is a fixed hashed-bin histogram
    (``n_bins`` BIGINTs per group — the CMS/HLL bounded-sketch
    posture): tokens md5-hash into bins, the reference distribution is
    folded into the same bins (:func:`binned_reference`), and the KL
    is computed bin-wise.  Binned KL is a LOWER BOUND of token-grain
    KL (log-sum inequality — hash-merging cells can only cancel
    differences), which is the right direction for an alerting signal:
    it under-fires, never false-fires from binning.  ``eps`` smooths
    reference bins so a group token in a zero-mass reference bin gives
    a large-but-finite score.

    State is additive, so N micro-batches and one batch reach the same
    final (counts, KL) — the batch↔streaming equivalence the rest of
    the streaming family proves in tests.  Input: token-grain rows
    (group_col, token_col) — explode upstream, keeping the UDF free of
    tokenizer coupling.

    Hot-path split: the md5 binning runs JVM-SIDE as a column
    expression (``conv(substring(md5(token), 1, 8), 16, 10) % n_bins``
    — bit-identical to :func:`_drift_bin`, asserted in tests), so the
    Python side of the stateful operator is a single ``np.bincount``
    per batch plus a fixed-order KL fold — no per-token Python work.
    """
    import math

    import numpy as np
    from pyspark.sql import functions as F

    ref = binned_reference(ref_probs, n_bins)
    denom = 1.0 + eps * n_bins
    q = [(ref[j] + eps) / denom for j in range(n_bins)]

    binned = stream.select(
        F.col(group_col),
        (
            F.conv(F.substring(F.md5(F.col(token_col).cast("string")), 1, 8), 16, 10)
            .cast("long") % n_bins
        ).cast("int").alias("_bin"),
    )

    def update(key, batches, state: GroupState):
        (counts,) = state.get if state.exists else ([0] * n_bins,)
        counts = np.asarray(counts, dtype="int64")
        for pdf in batches:
            counts += np.bincount(pdf["_bin"], minlength=n_bins)
        state.update(([int(c) for c in counts],))
        total = int(counts.sum())
        kl = 0.0
        if total:
            # fixed bin order: deterministic float fold
            for j in range(n_bins):
                if counts[j]:
                    p = counts[j] / total
                    kl += p * math.log(p / q[j])
        yield pd.DataFrame(
            {
                "grp": [str(key[0])],
                "n_tokens": [total],
                "kl_to_ref": [kl],
            }
        )

    return binned.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=DRIFT_OUTPUT_SCHEMA,
        stateStructType=DRIFT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
