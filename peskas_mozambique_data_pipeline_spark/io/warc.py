"""WARC (Web ARChive, ISO 28500) ingestion — the crawl-scale front door.

Common Crawl and most large web corpora land as WARC: a sequence of
records, each a ``WARC/1.x`` header block (named fields, CRLF lines,
``Content-Length`` payload framing) followed by the payload and a
``\\r\\n\\r\\n`` trailer.  Files are usually *member-gzipped*: every
record is its own gzip member, concatenated, so a reader can stream
member-by-member without decompressing the whole file.

This module parses both layouts with stdlib ``zlib`` only:

* :func:`read_warc` — ``binaryFile`` scan → ``mapInPandas`` parse.
  Scale shape: one file per input row, records fan OUT inside the
  scan-local Python batch, no shuffle anywhere; payloads stay
  ``binary`` (the opaque-multimodal column convention).  At 100 TB the
  parallelism unit is the WARC file (Common Crawl files are ~1 GB),
  which matches ``binaryFile``'s file-per-row model; set
  ``spark.sql.files.maxPartitionBytes`` has no effect here (whole-file
  rows), so partition count == file count — repartition after the scan
  if files are few and huge.
* :func:`http_payload` — split the HTTP response envelope out of
  ``response`` records (status line + headers vs body) as JVM-side
  binary ops where possible; the split itself needs a byte search, so
  it stays in the same pandas pass.
* :func:`warc_to_documents` — project response records into the
  ``documents``-shaped frame the curation DAG ingests (doc_id from the
  payload digest, url, text via permissive UTF-8 decode).

Reference provenance: the reference pipeline ingests survey JSON, not
WARC (R/ingestion.R) — this operator is part of the LLM-training-data
surface the engine adds beyond the reference.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF2 = b"\r\n\r\n"

WARC_SCHEMA = StructType(
    [
        StructField("warc_file", StringType()),
        StructField("record_offset", LongType()),
        StructField("warc_type", StringType()),
        StructField("record_id", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        # LONG, not INT: single WARC records can exceed 2 GiB (video
        # payloads in archive crawls)
        StructField("content_length", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the WARC layout) to one
    byte string.  ``wbits=47`` auto-detects the gzip wrapper; the
    ``unused_data`` loop walks member boundaries."""
    out = []
    buf = data
    while buf:
        d = zlib.decompressobj(wbits=47)
        out.append(d.decompress(buf))
        out.append(d.flush())
        if not d.unused_data or d.unused_data == buf:
            break
        buf = d.unused_data
    return b"".join(out)


def parse_warc_records(data: bytes, on_error: str = "raise"):
    """Yield ``(offset, headers: dict, payload: bytes)`` per WARC record.

    ``offset`` is the record's byte offset in the (decompressed)
    stream.  Header names are lower-cased; values keep their bytes
    decoded latin-1 (WARC headers are ASCII in practice).  Framing is
    by ``Content-Length`` exactly — no payload sniffing — then the
    mandatory CRLF CRLF record separator is skipped tolerantly (some
    writers emit only one CRLF pair at EOF).

    ``on_error``: ``"raise"`` (default — exact files, fail loud) or
    ``"skip"`` — resync at the next ``WARC/`` version line and keep
    going, so one corrupt record in a crawl-scale file loses only the
    bytes up to the next record instead of the whole job.  Skipped
    stretches are invisible in the output; a deployment that must
    account for them should quarantine files where the record count
    disagrees with the crawl manifest.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip': {on_error!r}")
    pos, n = 0, len(data)
    while pos < n:
        # Tolerate leading blank lines between records.
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            break
        start = pos
        head = data[pos:head_end].decode("latin-1", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            if on_error == "skip":
                nxt = data.find(b"\r\nWARC/", pos)
                if nxt < 0:
                    break
                pos = nxt + 2
                continue
            raise ValueError(f"not a WARC record at offset {start}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            clen = 0
        body_start = head_end + 4
        payload = data[body_start : body_start + clen]
        pos = body_start + clen
        yield start, headers, payload


def split_http_payload(payload: bytes):
    """Split an HTTP response envelope into ``(status, headers_text,
    body)``.  Returns ``(None, None, payload)`` when the payload does
    not start with an HTTP status line."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(_CRLF2)
    if sep < 0:
        return None, None, payload
    head = payload[:sep].decode("latin-1", "replace")
    lines = head.split("\r\n")
    try:
        status = int(lines[0].split(" ", 2)[1])
    except (IndexError, ValueError):
        return None, None, payload
    return status, "\r\n".join(lines[1:]), payload[sep + 4 :]


def _records_pdf(rows):
    """WARC_SCHEMA-shaped pandas frame from parsed record tuples — the
    Arrow batch builder shared by the batch scan, the CDX fetch, and
    the streaming twin."""
    cols = list(zip(*rows))
    return pd.DataFrame(
        {
            "warc_file": cols[0],
            "record_offset": pd.Series(cols[1], dtype="int64"),
            "warc_type": cols[2],
            "record_id": cols[3],
            "target_uri": cols[4],
            "warc_date": cols[5],
            "content_type": cols[6],
            "content_length": pd.Series(cols[7], dtype="int64"),
            "payload": cols[8],
        }
    )


def read_warc(
    spark: SparkSession, path: str, batch_records: int = 512,
    on_error: str = "raise",
) -> DataFrame:
    """Read WARC files (plain or member-gzip, detected per file by the
    gzip magic) into one row per record.

    ``binaryFile`` gives (path, content) whole-file rows; records fan
    out inside ``mapInPandas`` with the output yielded every
    ``batch_records`` records so Arrow batches stay bounded even for
    million-record files.  Payload bytes pass through untouched.
    ``on_error="skip"`` resyncs past malformed records instead of
    failing the job (see :func:`parse_warc_records`) — the right mode
    for crawl-scale archives where one corrupt file among thousands
    must not kill the read.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    data = gunzip_members(data)
                for off, hdrs, payload in parse_warc_records(data, on_error):
                    rows.append(
                        (
                            fpath,
                            off,
                            hdrs.get("warc-type"),
                            hdrs.get("warc-record-id"),
                            hdrs.get("warc-target-uri"),
                            hdrs.get("warc-date"),
                            hdrs.get("content-type"),
                            len(payload),
                            payload,
                        )
                    )
                    if len(rows) >= batch_records:
                        yield _records_pdf(rows)
                        rows = []
            if rows:
                yield _records_pdf(rows)

    raw = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(process, WARC_SCHEMA)


HTTP_SCHEMA = StructType(
    [
        StructField("warc_file", StringType()),
        StructField("record_id", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("http_status", IntegerType()),
        StructField("http_content_type", StringType()),
        StructField("body", BinaryType()),
    ]
)


def http_payload(records: DataFrame, batch_records: int = 512) -> DataFrame:
    """Project WARC ``response`` records to their HTTP bodies.

    The envelope split is a byte search, so it runs in the same
    scan-local pandas pass as the record parse would — filter to
    responses FIRST (JVM-side, pushes past the exchange-free plan) so
    non-response records never cross into Python.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_records):
                chunk = pdf.iloc[lo : lo + batch_records]
                rows = []
                for wf, rid, uri, dt, payload in zip(
                    chunk["warc_file"],
                    chunk["record_id"],
                    chunk["target_uri"],
                    chunk["warc_date"],
                    chunk["payload"],
                ):
                    status, head, body = split_http_payload(bytes(payload))
                    ctype = None
                    if head:
                        for ln in head.split("\r\n"):
                            if ln.lower().startswith("content-type:"):
                                ctype = ln.split(":", 1)[1].strip()
                                break
                    rows.append((wf, rid, uri, dt, status, ctype, body))
                if rows:
                    cols = list(zip(*rows))
                    yield pd.DataFrame(
                        {
                            "warc_file": cols[0],
                            "record_id": cols[1],
                            "target_uri": cols[2],
                            "warc_date": cols[3],
                            "http_status": pd.Series(
                                cols[4], dtype="Int32"
                            ),
                            "http_content_type": cols[5],
                            "body": cols[6],
                        }
                    )

    resp = records.filter(F.col("warc_type") == "response").select(
        "warc_file", "record_id", "target_uri", "warc_date", "payload"
    )
    return resp.mapInPandas(process, HTTP_SCHEMA)


def warc_to_documents(http_df: DataFrame) -> DataFrame:
    """Shape HTTP responses into the curation DAG's ``documents``
    contract — ``(doc_id, text, lang, source, n_chars)`` exactly as in
    the testdata ``documents`` table — plus ``url`` so the DAG's URL
    front-door stage (``stage_url_dedup``) can run on crawl output.

    * ``doc_id`` = first 15 hex digits of the body's sha256 as a
      BIGINT (15, not 16: a 16th digit could overflow signed BIGINT) —
      content-addressed, so refetches of identical bytes get identical
      ids and the exact-dedup stage collapses them for free.
    * text = permissive UTF-8 decode (JVM ``decode`` with
      round-trippable failure → non-UTF-8 bytes become replacement
      chars rather than failing the scan).
    * Only 200-status text responses survive; everything else is a
      JVM-side filter before any decode work.
    """
    kept = http_df.filter(
        (F.col("http_status") == 200)
        & F.col("http_content_type").startswith("text/")
    )
    text = F.decode(F.col("body"), "UTF-8")
    return kept.select(
        F.conv(F.substring(F.sha2(F.col("body"), 256), 1, 15), 16, 10)
        .cast("bigint")
        .alias("doc_id"),
        text.alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.col("warc_file").alias("source"),
        F.length(text).cast("bigint").alias("n_chars"),
        F.col("target_uri").alias("url"),
    )


def digest_doc_id(body_bytes: bytes) -> int:
    """Python twin of the ``doc_id`` expression in
    :func:`warc_to_documents`, for tests."""
    return int(hashlib.sha256(body_bytes).hexdigest()[:15], 16)


CDX_SCHEMA = StructType(
    [
        StructField("canonical_url", StringType()),
        StructField("url", StringType()),
        StructField("warc_date", StringType()),
        StructField("warc_file", StringType()),
        StructField("record_offset", LongType()),
        StructField("content_length", LongType()),
        StructField("digest", StringType()),
    ]
)


def build_cdx(records: DataFrame) -> DataFrame:
    """CDX-style capture index over ``read_warc`` output: one row per
    ``response`` record — the lookup table that makes a WARC archive
    randomly accessible (the role of the CDX(J) files that ship next
    to Common Crawl's WARCs).

    Columns: canonical URL key (the dedup-family key, so index lookups
    and URL dedup agree on identity), raw URL, capture date, the
    (file, offset-in-decompressed-stream) locator, payload length and
    the payload's sha256 — all JVM-side column expressions over the
    already-parsed record frame; no second pass over the bytes.

    At crawl scale, persist with ``save_cdx_zone`` (bucketed by the
    URL key) so point lookups prune to one bucket instead of scanning
    the index.
    """
    from ..operators.web import canonical_url as _canon

    return records.filter(F.col("warc_type") == "response").select(
        _canon(F.col("target_uri")).alias("canonical_url"),
        F.col("target_uri").alias("url"),
        "warc_date",
        "warc_file",
        "record_offset",
        "content_length",
        F.sha2(F.col("payload"), 256).alias("digest"),
    )


def save_cdx_zone(zones, cdx: DataFrame, prefix: str = "cdx", n_buckets: int = 8) -> str:
    """Persist a CDX frame bucketed on ``canonical_url`` — point
    lookups and URL-keyed joins against the archive index read one
    bucket, not the index."""
    return zones.write_bucketed(cdx, prefix, ["canonical_url"], n_buckets)


def fetch_by_cdx(
    spark: SparkSession, cdx: DataFrame, warc_root: str
) -> DataFrame:
    """Random-access record extraction: given CDX rows (``warc_file``,
    ``record_offset``), re-read ONLY the referenced records from the
    archive under ``warc_root``.

    Distributed shape: offsets aggregate per file (one shuffle over
    the — tiny — CDX selection), join the whole-file ``binaryFile``
    scan on path, then a bounded ``mapInPandas`` decompresses each
    matched file once and parses records ONLY at the requested
    offsets (no full-archive record fan-out, no driver collect).
    Files the selection never references are dropped by the inner
    join before any byte is decompressed.
    """
    wants = cdx.groupBy("warc_file").agg(
        F.collect_set("record_offset").alias("_offs")
    )
    raw = (
        spark.read.format("binaryFile")
        .load(warc_root)
        .select(F.col("path").alias("warc_file"), "content")
        .join(wants, "warc_file")
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content, offs in zip(
                pdf["warc_file"], pdf["content"], pdf["_offs"]
            ):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    data = gunzip_members(data)
                want = {int(o) for o in offs}
                for off, hdrs, payload in parse_warc_records(data, "skip"):
                    if off not in want:
                        continue
                    rows.append(
                        (
                            fpath,
                            off,
                            hdrs.get("warc-type"),
                            hdrs.get("warc-record-id"),
                            hdrs.get("warc-target-uri"),
                            hdrs.get("warc-date"),
                            hdrs.get("content-type"),
                            len(payload),
                            payload,
                        )
                    )
            if rows:
                cols = list(zip(*rows))
                yield pd.DataFrame(
                    {
                        "warc_file": cols[0],
                        "record_offset": pd.Series(cols[1], dtype="int64"),
                        "warc_type": cols[2],
                        "record_id": cols[3],
                        "target_uri": cols[4],
                        "warc_date": cols[5],
                        "content_type": cols[6],
                        "content_length": pd.Series(cols[7], dtype="int64"),
                        "payload": cols[8],
                    }
                )

    return raw.mapInPandas(process, WARC_SCHEMA)


def stream_warc_documents(
    spark: SparkSession,
    landing_dir: str,
    batch_records: int = 512,
    on_error: str = "skip",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of the WARC→documents front door: watch a landing
    directory for NEW archive files and emit ``documents``-shaped rows
    as they arrive — continuous crawl ingest instead of batch backfill.

    The ``binaryFile`` file-stream source gives the same whole-file
    rows as the batch scan, so the identical stateless
    ``mapInPandas``/projection chain runs per micro-batch; the file is
    the unit of progress (a half-written archive must be moved into
    the landing dir atomically, the standard file-source contract).
    Compose with ``streaming.ingest.write_zone`` or the dedup/URL
    front-door streaming twins; content-addressed doc ids mean a
    re-delivered file dedups downstream exactly like a batch refetch.
    """
    reader = spark.readStream.format("binaryFile")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    raw = reader.schema(
        "path string, modificationTime timestamp, length long, content binary"
    ).load(landing_dir).select("path", "content")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    data = gunzip_members(data)
                for off, hdrs, payload in parse_warc_records(data, on_error):
                    rows.append(
                        (
                            fpath,
                            off,
                            hdrs.get("warc-type"),
                            hdrs.get("warc-record-id"),
                            hdrs.get("warc-target-uri"),
                            hdrs.get("warc-date"),
                            hdrs.get("content-type"),
                            len(payload),
                            payload,
                        )
                    )
                    if len(rows) >= batch_records:
                        yield _records_pdf(rows)
                        rows = []
            if rows:
                yield _records_pdf(rows)

    records = raw.mapInPandas(process, WARC_SCHEMA)
    return warc_to_documents(http_payload(records))
