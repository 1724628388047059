"""Structured Streaming ingest of the landing zone (SURVEY §7.3-11).

The reference's "streaming" is a 48-hour cron that re-pulls everything
(.github/workflows/data-pipeline.yaml:4-5).  Spark-first, the landing
zone becomes a stream: new survey/event files picked up incrementally,
with event-time windowed arrival stats and watermarked late-data
handling subsuming the cron semantics.

All functions return lazy streaming DataFrames/queries; tests drive
them with ``trigger(availableNow=True)`` so they run bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stream_landing_zone(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Incremental file-source stream over a landing-zone directory.

    ``maxFilesPerTrigger`` bounds per-batch work on a large backlog —
    at 100 TB the zone is partitioned by arrival date and each
    micro-batch handles a bounded file set.
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def arrival_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window arrival counts with a watermark for late data.

    The watermark bounds state: windows older than ``watermark`` close
    and their state is dropped — mandatory for an unbounded stream.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-style dedup over a bounded horizon: drops repeated
    ids arriving within the watermark window.  State is bounded by the
    watermark — the streaming analog of the ingest uniqueness assertion
    (R/ingestion.R:45-50)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(id_cols)


def write_zone(
    df: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
    output_mode: str = "append",
):
    """Write a streaming DataFrame to a curated parquet zone.

    ``availableNow`` processes the current backlog then stops — the
    batch-cron replacement mode; without it the query runs continuous.
    """
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _stable_zone_path(
    zone_dir: str, prefix: str, checkpoint: str, git_sha: str
) -> str:
    """Derive the snapshot directory STABLY from the checkpoint.

    The minted version name is persisted in a sidecar file under the
    checkpoint dir on first start and reused on every restart.  Without
    this, a wall-clock-minted path would change across a crash-restart:
    the replayed batch would land in a NEW version dir while the partial
    ``batch=<id>`` data persisted in the old one, and the zone union
    (:func:`read_stream_zone`) would see duplicate rows — exactly the
    failure window the idempotent batch overwrite is supposed to heal.
    Only the dir NAME is persisted, so a relocated ``zone_dir`` keeps
    working.
    """
    import os

    from ..io.parquet_io import versioned_name

    os.makedirs(checkpoint, exist_ok=True)
    sidecar = os.path.join(checkpoint, "__zone_version__")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            name = f.read().strip()
    else:
        name = versioned_name(prefix, git_sha)
        tmp = sidecar + ".tmp"
        with open(tmp, "w") as f:
            f.write(name)
        os.replace(tmp, sidecar)  # atomic: a crash mid-write can't
        # leave a torn sidecar that silently points nowhere
    return os.path.join(zone_dir, name)


def stream_to_versioned_zone(
    df: DataFrame,
    zone_dir: str,
    prefix: str,
    checkpoint: str,
    git_sha: str = "local",
    available_now: bool = True,
):
    """Close the streaming → versioned-zone loop: micro-batches land
    under ONE versioned snapshot directory, partitioned by batch id.

    Exactly-once shape: ``foreachBatch`` writes each micro-batch with
    ``overwrite`` into its own ``batch=<id>`` subdirectory — a batch
    replayed after a failure between write and checkpoint commit
    overwrites its own output instead of duplicating it (the standard
    idempotent-sink pattern).  For the overwrite to heal the replay the
    snapshot path must be the SAME on restart, so it is derived from
    the checkpoint via a sidecar (:func:`_stable_zone_path`): one zone
    version per checkpoint lifetime (batch ids are monotonic within a
    checkpoint, so every batch dir is written at most once plus
    idempotent replays).  A new logical run = a new checkpoint = a new
    auditable zone version.  Readers use ``spark.read.parquet`` on the
    snapshot dir; partition discovery picks up the batch= subdirs.
    """
    import os

    path = _stable_zone_path(zone_dir, prefix, checkpoint, git_sha)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(path, f"batch={batch_id}")
        )

    writer = df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), path


def read_stream_zone(spark: SparkSession, zone_dir: str, prefix: str) -> DataFrame:
    """Read the FULL streaming zone: unlike batch snapshots (each
    version is complete, read the newest), streaming versions are
    incremental — one per checkpoint lifetime (epoch) — so the table is
    the union of every ``prefix__*`` version directory.  Correctness
    contract: an epoch's checkpoint tracks which source files it
    consumed, so epochs never overlap as long as each new checkpoint
    consumes arrivals the previous epoch hadn't seen (retire the old
    landing data with the old checkpoint); within an epoch the sidecar-
    pinned version dir + idempotent batch overwrite make restarts
    exactly-once."""
    import glob as _glob
    import os

    from functools import reduce

    paths = sorted(_glob.glob(os.path.join(zone_dir, f"{prefix}__*")))
    if not paths:
        raise FileNotFoundError(f"no streaming zone versions for {prefix!r} in {zone_dir}")
    # one read per version root (the non-k=v version dir names confuse
    # multi-root partition discovery), then a zero-shuffle union
    return reduce(
        lambda a, b: a.unionByName(b), (spark.read.parquet(p) for p in paths)
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    lower: str = "0 seconds",
    upper: str = "24 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each left event matches right
    events of the same key whose timestamp falls in
    ``[left_ts + lower, left_ts + upper]`` — the streaming twin of
    ``operators/joins.interval_join`` (attribution windows computed AS
    events arrive instead of in batch).

    This is Spark's native watermarked stream-stream join: both sides
    buffer in the state store, and the time-range condition PLUS the
    watermarks bound that state — without the range bound the state
    grows forever, so this wrapper refuses to build an unbounded join.
    State per key ≈ events within (upper − lower) + watermark; late
    rows beyond the watermark are dropped, exactly the semantics the
    batch operator applies retroactively.

    Both inputs must carry DISTINCT column names apart from the join
    key (the batch operator's same rule).
    """
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(
            f"columns {sorted(overlap)} exist on both sides; rename first"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[on])
        & (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond).drop(rw[on])


def stream_sessions(
    stream: DataFrame,
    gap: str = "30 minutes",
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-based sessionization: Spark's native
    ``session_window`` over a watermarked stream — the streaming twin
    of the batch ``sessionization`` registry query (same gap, same
    aggregates), computed incrementally as events arrive.

    State per key = the one OPEN session (session_window state merges
    overlapping windows as rows arrive); the watermark closes sessions
    whose gap has provably expired and evicts their state, so memory is
    bounded by active keys, not history.  Append mode emits each
    session exactly once, on close — late rows beyond the watermark are
    dropped, which the batch operator applies retroactively.

    Session value sums centi-quantized integers (the batch twin's
    rule), so replays and partial merges are order-free exact.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(key)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.round(F.col(value_col) * 100).cast("long")) / 100.0
            ).alias("session_value"),
        )
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def stream_bloom_decontaminate(
    stream: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    n_words: int = 1024,
    k: int = 3,
    exact_verify: bool = True,
) -> DataFrame:
    """Streaming twin of ``operators.text.bloom_decontaminate`` —
    completes the batch↔streaming symmetry table (rolling_zscore↔
    anomaly_flags, source_cap↔stream_source_cap, token_drift↔
    stream_token_drift, batch dedup↔dedup_index, decontamination↔this).

    The Bloom bitmask is built ONCE from the static benchmark side
    (one batch job) and enters the stream as a stream-static broadcast
    cross join of a single row — per micro-batch the probe is the same
    scan-local codegen predicate as the batch operator, so throughput
    is scan-bound and NO streaming state is held at all (the filter is
    stateless; watermarks/state belong to downstream aggregations).

    ``exact_verify=True`` additionally strikes Bloom false positives
    with an exact membership check — but streaming forbids the batch
    operator's join-back shape (it would be a stream-stream self-join
    / stateful distinct), so the exact check is ROW-LOCAL: the
    benchmark gram digests fold into a one-row broadcast MAP and each
    bloom-positive row probes it with ``map_contains_key`` (hash O(1)
    per gram, no state, no shuffle).  Bloom-negative rows skip even
    that.  With ``exact_verify=False`` the op is a pure prefilter
    whose output may drop a clean doc only with Bloom-FP probability
    (use when the digest map is too large to broadcast and a
    downstream batch audit reconciles).

    Returns the stream of CLEAN documents (contaminated rows dropped).
    """
    from ..operators.text import build_ngram_bloom, token_ngrams

    n_bits = n_words * 64
    bloom = build_ngram_bloom(benchmark, text_col, n, n_words, k)
    probes = []
    for j in range(k):
        h = (
            f"CAST(conv(substring(md5(concat_ws('#', md5(g), '{j}')), 1, 15),"
            f" 16, 10) AS BIGINT) % {n_bits}"
        )
        probes.append(
            f"(element_at(bloom_words, CAST(({h}) div 64 AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST(({h}) % 64 AS INT))) <> 0"
        )
    maybe = F.expr(f"exists(_grams, g -> {' AND '.join(probes)})")
    flagged = (
        stream.crossJoin(F.broadcast(bloom))
        .withColumn("_grams", F.array_distinct(token_ngrams(text_col, n)))
        .withColumn("_maybe", maybe)
    )
    if not exact_verify:
        return flagged.filter(~F.col("_maybe")).drop(
            "_grams", "_maybe", "bloom_words"
        )
    bench_map = (
        benchmark.select(
            F.explode(F.array_distinct(token_ngrams(text_col, n))).alias("gram")
        )
        .select(F.md5("gram").alias("_gh"))
        .distinct()
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_gh"), F.lit(True)))
            ).alias("bench_map")
        )
    )
    # row-local exact verdict: a bloom-positive row is contaminated
    # iff some gram is REALLY in the benchmark map; bloom-negative
    # rows short-circuit (the when() guard keeps them off the map)
    exact_hit = F.expr(
        "exists(_grams, g -> map_contains_key(bench_map, md5(g)))"
    )
    return (
        flagged.crossJoin(F.broadcast(bench_map))
        .withColumn(
            "_dirty", F.when(F.col("_maybe"), exact_hit).otherwise(F.lit(False))
        )
        .filter(~F.col("_dirty"))
        .drop("_grams", "_maybe", "_dirty", "bloom_words", "bench_map")
    )
