"""Streaming source abstraction (SURVEY §7 posture): one interface the
downstream streaming plans (``arrival_stats``, ``streaming_dedup``,
``trip_segments``) consume, with three implementations:

* ``FileStreamSource`` — the landing-zone file source (parquet/json),
  the offline double AND the real at-scale shape (API pages land on
  object storage, Spark streams the directory).
* ``RateStreamSource`` — Spark's built-in ``rate`` source mapped to the
  events schema; synthetic sustained load for soak tests.
* ``RateMicroBatchSource`` — deterministic ``rate-micro-batch`` source
  whose EVENT time advances a fixed step per batch: simulated hours in
  wall-clock seconds, so watermark-driven state eviction is testable.
* ``KafkaStreamSource`` — config-complete Kafka reader (bootstrap
  servers, topic, offsets, JSON value decode).  The Kafka connector jar
  is not in this container, so ``read_stream`` raises a clear error if
  the package is missing — the option construction and value decoding
  are real and unit-tested.

Downstream code takes a ``StreamSource``, so swapping file → Kafka is a
config change, not a plan change — the point of the abstraction.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .ingest import stream_landing_zone


class StreamSource:
    """Anything that yields a streaming DataFrame of typed records."""

    def read_stream(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError


@dataclass
class FileStreamSource(StreamSource):
    """Landing-zone directory stream (see ``stream_landing_zone``)."""

    path: str
    schema: StructType
    fmt: str = "parquet"
    max_files_per_trigger: int | None = None

    def read_stream(self, spark: SparkSession) -> DataFrame:
        return stream_landing_zone(
            spark, self.path, self.schema, self.fmt, self.max_files_per_trigger
        )


@dataclass
class RateStreamSource(StreamSource):
    """Built-in ``rate`` source (timestamp, value) with an optional
    projection to the target record shape; unbounded synthetic load."""

    rows_per_second: int = 100
    num_partitions: int | None = None
    project: Callable[[DataFrame], DataFrame] | None = None

    def read_stream(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.format("rate").option(
            "rowsPerSecond", str(self.rows_per_second)
        )
        if self.num_partitions:
            reader = reader.option("numPartitions", str(self.num_partitions))
        raw = reader.load()
        return self.project(raw) if self.project else raw


@dataclass
class RateMicroBatchSource(StreamSource):
    """Built-in ``rate-micro-batch`` source: a DETERMINISTIC batch
    stream whose event time advances ``advance_millis_per_batch`` per
    micro-batch regardless of wall clock.

    This is the soak-test workhorse: hours of simulated event time pass
    in seconds of wall time, so watermark-driven state eviction (window
    close, dedup horizon expiry) is observable in a bounded test run —
    the plain ``rate`` source stamps wall-clock ``now()`` and would need
    a real hour to close a 1-hour window.
    """

    rows_per_batch: int = 100
    start_timestamp_ms: int = 0
    advance_millis_per_batch: int = 1000
    num_partitions: int | None = None
    project: Callable[[DataFrame], DataFrame] | None = None

    def read_stream(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", str(self.rows_per_batch))
            .option("startTimestamp", str(self.start_timestamp_ms))
            .option("advanceMillisPerBatch", str(self.advance_millis_per_batch))
        )
        if self.num_partitions:
            reader = reader.option("numPartitions", str(self.num_partitions))
        raw = reader.load()
        return self.project(raw) if self.project else raw


def rate_as_events(raw: DataFrame) -> DataFrame:
    """Map the rate source's (timestamp, value) to the events schema the
    streaming plans consume — synthetic but shape-faithful."""
    return raw.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 100).alias("user_id"),
        F.when(F.col("value") % 2 == 0, F.lit("click"))
        .otherwise(F.lit("view"))
        .alias("event_type"),
        (F.col("value") % 10).cast("double").alias("value"),
    )


@dataclass
class KafkaStreamSource(StreamSource):
    """Kafka reader config + JSON value decode.

    ``reader_options()`` exposes the exact option map handed to
    ``readStream.format("kafka")``; ``decode`` turns the raw Kafka
    (key, value, timestamp, ...) frame into typed records by parsing
    the value as JSON against ``value_schema``.  Requires the
    spark-sql-kafka package at runtime (not bundled here).
    """

    bootstrap_servers: str
    topic: str
    value_schema: StructType
    starting_offsets: str = "earliest"
    extra_options: Mapping[str, str] = field(default_factory=dict)

    def reader_options(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribe": self.topic,
            "startingOffsets": self.starting_offsets,
            **self.extra_options,
        }

    def decode(self, raw: DataFrame) -> DataFrame:
        return raw.select(
            F.from_json(F.col("value").cast("string"), self.value_schema).alias("r")
        ).select("r.*")

    def read_stream(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.format("kafka")
        for k, v in self.reader_options().items():
            reader = reader.option(k, v)
        try:
            raw = reader.load()
        except Exception as e:  # pragma: no cover - container lacks the jar
            raise RuntimeError(
                "Kafka source requires the spark-sql-kafka connector package "
                "on the classpath (not bundled in this environment)"
            ) from e
        return self.decode(raw)
