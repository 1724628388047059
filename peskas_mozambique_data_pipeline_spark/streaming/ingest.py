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
