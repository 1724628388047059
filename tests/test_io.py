from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.io import connectors, geojson, parquet_io


def test_versioned_write_and_read_latest(spark, tmp_path):
    zone = str(tmp_path / "zone")
    df1 = spark.createDataFrame([(1, "old")], ["k", "v"])
    df2 = spark.createDataFrame([(1, "new")], ["k", "v"])
    parquet_io.write_versioned(df1, zone, "landings", git_sha="aaa")
    time.sleep(1.1)  # version stamps have 1s resolution
    p2 = parquet_io.write_versioned(df2, zone, "landings", git_sha="bbb")
    assert parquet_io.latest_version_path(zone, "landings") == p2
    back = parquet_io.read_latest(spark, zone, "landings")
    assert back.first().v == "new"
    with pytest.raises(FileNotFoundError):
        parquet_io.latest_version_path(zone, "nope")


def test_compact_zone_shrinks_files_preserves_rows(spark, tmp_path):
    """Small-file compaction: a fragmented snapshot (40 shards for a
    tiny table) rewrites as a NEW version with file count derived from
    actual bytes, identical rows, and read_latest flipping over —
    the old version stays on disk (immutability / time travel)."""
    zone = str(tmp_path / "zone")
    df = spark.range(0, 2000).withColumn("v", F.col("id") * 2)
    p1 = parquet_io.write_versioned(df.repartition(40), zone, "events")
    n_before, bytes_before = parquet_io.zone_file_stats(zone, "events")
    assert n_before == 40
    p2 = parquet_io.compact_zone(spark, zone, "events", target_mb=256)
    assert p2 != p1
    assert parquet_io.latest_version_path(zone, "events") == p2
    n_after, bytes_after = parquet_io.zone_file_stats(zone, "events")
    assert n_after == 1  # tiny table, one 256MB-target file
    back = spark.read.parquet(p2)
    assert back.count() == 2000
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]
    # the pre-compaction version is still readable
    assert spark.read.parquet(p1).count() == 2000


def test_compact_zone_range_layout_prunes(spark, tmp_path):
    """range_by compaction establishes disjoint per-file key ranges
    while rewriting (file-level pruning for range predicates)."""
    zone = str(tmp_path / "zone")
    df = spark.range(0, 1000).withColumn("k", F.col("id"))
    parquet_io.write_versioned(df.repartition(20), zone, "facts")
    # force multiple output files to observe the range layout
    p2 = parquet_io.compact_zone(
        spark, zone, "facts", target_mb=256, range_by=["k"]
    )
    back = spark.read.parquet(p2)
    assert back.count() == 1000
    # same-second rewrite still resolved as the newest version
    assert parquet_io.latest_version_path(zone, "facts") == p2


def test_compact_zone_zorder_layout_bounds_both_dims(spark, tmp_path):
    """zorder_by compaction clusters the rewrite on the Morton key:
    the key column is dropped, rows survive exactly, and every output
    file's min/max footer bounds BOTH listed dimensions well under the
    global span (multi-dimensional pruning, not 1-D)."""
    zone = str(tmp_path / "zone")
    rows = [(i, i % 64, i // 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    parquet_io.write_versioned(df.repartition(30), zone, "grid")
    p2 = parquet_io.compact_zone(
        spark, zone, "grid", target_mb=256, zorder_by=["x", "y"],
        zorder_bits=6,
    )
    back = spark.read.parquet(p2)
    assert back.columns == ["id", "x", "y"]  # _zkey dropped
    assert {tuple(r) for r in back.collect()} == set(rows)
    import pytest

    with pytest.raises(ValueError):
        parquet_io.compact_zone(
            spark, zone, "grid", zorder_by=["x"], range_by=["y"]
        )
    # file count derives from bytes (1 here); the multi-file footer-
    # span property is pinned by test_layout.py's writer test


def test_jsonl_survey_source_and_uniqueness(spark, tmp_path):
    p = tmp_path / "dump.jsonl"
    p.write_text('{"_id": "a", "v": 1}\n{"_id": "b", "v": 2}\n')
    src = connectors.JsonlSurveySource(lambda asset: str(p))
    df = src.fetch_submissions(spark, "asset1")
    assert df.count() == 2
    connectors.assert_unique_ids(df)  # no raise
    dup = df.unionByName(df)
    with pytest.raises(ValueError, match="duplicate"):
        connectors.assert_unique_ids(dup)


def test_rest_batch_sink_batches_of_10(spark, tmp_path):
    sink_file = tmp_path / "batches.jsonl"

    def send(batch):
        with open(sink_file, "a") as f:
            f.write(json.dumps(len(batch)) + "\n")

    df = spark.createDataFrame([(i,) for i in range(23)], ["k"]).coalesce(1)
    connectors.RestBatchSink(send=send, batch_size=10).write(df)
    sizes = [json.loads(line) for line in sink_file.read_text().splitlines()]
    assert sorted(sizes, reverse=True) == [10, 10, 3]


def test_rate_limited_status_fetch_requires_schema_or_probe(spark):
    df = spark.createDataFrame([("s1",)], ["submission_id"])
    with pytest.raises(ValueError, match="schema"):
        connectors.rate_limited_status_fetch(df, lambda sid: {}, rate_limit_s=0.0)
    # probe path uses a REAL nominated id, never a magic probe id
    seen = []

    def fetch(sid):
        seen.append(sid)
        return {"validation_status": f"ok-{sid}"}

    out = connectors.rate_limited_status_fetch(
        df, fetch, n_workers=1, rate_limit_s=0.0, probe_id="s1"
    )
    assert out.first().validation_status == "ok-s1"
    assert seen[0] == "s1" and "__schema_probe__" not in seen


def test_rate_limited_status_fetch(spark):
    def fetch(sid: str) -> dict:
        return {"validation_status": f"ok-{sid}"}

    df = spark.createDataFrame([("s1",), ("s2",)], ["submission_id"])
    out = connectors.rate_limited_status_fetch(
        df, fetch, n_workers=2, rate_limit_s=0.0, schema="validation_status string"
    )
    got = {r.submission_id: r.validation_status for r in out.collect()}
    assert got == {"s1": "ok-s1", "s2": "ok-s2"}


def test_document_sink_roundtrip(spark, tmp_path):
    sink = connectors.DocumentSink(str(tmp_path / "coll"))
    df = spark.createDataFrame([(1, "x")], ["k", "v"])
    sink.push(df)
    back = sink.pull(spark)
    assert back.count() == 1 and back.first().v == "x"


def test_geojson_read_and_attribute_join(spark, tmp_path):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"region": "cabo_delgado", "code": 1},
                "geometry": {"type": "Point", "coordinates": [40.0, -12.0]},
            },
            {
                "type": "Feature",
                "properties": {"region": "nampula", "code": 2},
                "geometry": {"type": "Point", "coordinates": [39.0, -15.0]},
            },
        ],
    }
    p = tmp_path / "regions.geojson"
    p.write_text(json.dumps(fc))
    geo = geojson.read_geojson_features(spark, str(p))
    assert geo.count() == 2
    assert "geometry_json" in geo.columns
    attrs = spark.createDataFrame([("cabo_delgado", 9.5)], ["region", "median_cpue"])
    joined = geojson.join_attributes(geo, attrs)
    got = {r.region: r.median_cpue for r in joined.collect()}
    assert got == {"cabo_delgado": 9.5, "nampula": None}


def test_reference_table_fallback(spark, tmp_path):
    # S15: API table load falls back to the packaged snapshot on failure
    packaged = tmp_path / "lw_fallback"
    spark.createDataFrame([("SNA", 0.02, 2.9)], "catch_taxon string, a double, b double") \
        .write.parquet(str(packaged))

    def load_reference(primary_path: str):
        try:
            return spark.read.parquet(primary_path)
        except Exception:
            return spark.read.parquet(str(packaged))

    df = load_reference(str(tmp_path / "missing"))
    assert df.first().catch_taxon == "SNA"


def test_latest_version_path_exact_prefix_only(spark, tmp_path):
    # "trips" must never resolve a "trips_extra" snapshot
    zone = str(tmp_path / "zone2")
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    p_trips = parquet_io.write_versioned(df, zone, "trips", git_sha="aaa")
    time.sleep(1.1)
    parquet_io.write_versioned(df, zone, "trips_extra", git_sha="bbb")
    assert parquet_io.latest_version_path(zone, "trips") == p_trips


# ---------------------------------------------------------------------------
# Pagination against a real local HTTP double (S10 + S3 across pages)


def _serve_pages(pages_by_offset, results_mode=False):
    """Tiny localhost HTTP server: Airtable mode answers ?offset=tok with
    {"records": [...], "offset": next}; Kobo mode answers ?start=M&limit=N
    with {"results": [...], "count": total}."""
    import http.server
    import json as _json
    import threading
    from urllib.parse import parse_qs, urlparse

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            if results_mode:
                start = int(q.get("start", ["0"])[0])
                limit = int(q.get("limit", ["1000"])[0])
                all_recs = pages_by_offset
                body = {"results": all_recs[start : start + limit], "count": len(all_recs)}
            else:
                tok = q.get("offset", [None])[0]
                body = pages_by_offset[tok]
            payload = _json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def _http_json(url):
    import json as _json
    import urllib.request

    with urllib.request.urlopen(url) as r:
        return _json.loads(r.read())


def test_airtable_offset_pagination_multi_page(spark, tmp_path):
    pages = {
        None: {"records": [{"id": f"rec{i}", "fields": {"k": i, "tags": ["a", "b"]}} for i in range(4)],
               "offset": "tok1"},
        "tok1": {"records": [{"id": f"rec{i}", "fields": {"k": i}} for i in range(4, 7)],
                 "offset": "tok2"},
        "tok2": {"records": [{"id": "rec7", "fields": {"k": 7}}]},
    }
    srv, base = _serve_pages(pages)
    try:
        def fetch_page(offset):
            url = base + (f"/?offset={offset}" if offset else "/")
            body = _http_json(url)
            return body["records"], body.get("offset")

        src = connectors.PaginatedSource(
            connectors.iter_offset_token_pages(fetch_page),
            str(tmp_path / "landing"),
            transform=connectors.flatten_airtable_record,
            id_col="airtable_id",
        )
        df = src.fetch_submissions(spark)
        rows = {r.airtable_id: r for r in df.collect()}
        assert len(rows) == 8  # all three pages landed
        assert rows["rec0"].tags == "a, b"  # list collapsed
    finally:
        srv.shutdown()


def test_kobo_limit_start_pagination_and_duplicate_detection(spark, tmp_path):
    recs = [{"_id": i % 5, "v": i} for i in range(7)]  # ids collide across pages
    srv, base = _serve_pages(recs, results_mode=True)
    try:
        def fetch_page(start, limit):
            body = _http_json(base + f"/?start={start}&limit={limit}")
            return body["results"], body["count"]

        src = connectors.PaginatedSource(
            connectors.iter_limit_start_pages(fetch_page, limit=3),
            str(tmp_path / "landing_kobo"),
            id_col="_id",
        )
        with pytest.raises(ValueError, match="duplicate submission ids"):
            src.fetch_submissions(spark)
    finally:
        srv.shutdown()


def test_rest_upsert_sink_patch_post_split(spark, tmp_path):
    # sends run in worker processes — record batch sizes via files
    patch_f, post_f = str(tmp_path / "patch.log"), str(tmp_path / "post.log")

    def recorder(path):
        def send(batch):
            with open(path, "a") as f:
                f.write(json.dumps([len(batch), [r.get("airtable_id") for r in batch]]) + "\n")
        return send

    sink = connectors.RestUpsertSink(
        send_patch=recorder(patch_f), send_post=recorder(post_f), batch_size=10
    )
    df = spark.createDataFrame(
        [(f"rec{i}" if i < 23 else None, i) for i in range(40)],
        "airtable_id string, v long",
    ).coalesce(1)
    sink.write(df)
    patches = [json.loads(l) for l in open(patch_f).read().splitlines()]
    posts = [json.loads(l) for l in open(post_f).read().splitlines()]
    assert sum(n for n, _ in patches) == 23 and max(n for n, _ in patches) <= 10
    assert sum(n for n, _ in posts) == 17 and max(n for n, _ in posts) <= 10
    assert all(i is not None for _, ids in patches for i in ids)  # PATCH side keeps ids
    assert all(i is None for _, ids in posts for i in ids)  # POST side drops the id col


# ---------------------------------------------------------------------------
# RestClient: auth headers, retry/backoff, endpoint construction


def _serve_api(routes, fail_first=0, fail_code=429, require_auth=None):
    """Localhost API double: asserts the auth header, fails the first
    ``fail_first`` requests with ``fail_code`` (Retry-After: 0), then
    serves ``routes[path]`` (query stripped).  Records every request."""
    import http.server
    import json as _json
    import threading
    from urllib.parse import urlparse

    log = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def _handle(self):
            length = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(length) if length else b""
            log.append(
                {
                    "method": self.command,
                    "path": self.path,
                    "auth": self.headers.get("Authorization"),
                    "body": _json.loads(body) if body else None,
                }
            )
            if require_auth and self.headers.get("Authorization") != require_auth:
                self.send_response(401)
                self.end_headers()
                return
            if len(log) <= fail_first:
                self.send_response(fail_code)
                self.send_header("Retry-After", "0")
                self.end_headers()
                return
            key = urlparse(self.path).path
            payload = _json.dumps(routes.get(key, {})).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(payload)

        do_GET = do_POST = do_PATCH = _handle

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}", log


def test_rest_client_retries_429_with_auth():
    srv, base, log = _serve_api(
        {"/ping": {"ok": True}}, fail_first=2, require_auth="Bearer k3y"
    )
    try:
        naps = []
        client = connectors.airtable_client(base, "k3y", sleep=naps.append)
        assert client.get_json("/ping") == {"ok": True}
        assert len(log) == 3  # two 429s then success
        assert all(r["auth"] == "Bearer k3y" for r in log)
        assert naps == [0.0, 0.0]  # honored Retry-After: 0 both times
    finally:
        srv.shutdown()


def test_rest_client_gives_up_after_max_retries():
    import urllib.error

    srv, base, log = _serve_api({}, fail_first=99, fail_code=503)
    try:
        client = connectors.RestClient(base, max_retries=2, sleep=lambda s: None)
        with pytest.raises(urllib.error.HTTPError):
            client.get_json("/x")
        assert len(log) == 3  # initial + 2 retries
    finally:
        srv.shutdown()


def test_rest_client_4xx_raises_immediately():
    import urllib.error

    srv, base, log = _serve_api({}, fail_first=99, fail_code=404)
    try:
        client = connectors.RestClient(base, sleep=lambda s: None)
        with pytest.raises(urllib.error.HTTPError):
            client.get_json("/gone")
        assert len(log) == 1
    finally:
        srv.shutdown()


def test_kobo_client_paginated_ingest_with_auth(spark, tmp_path):
    import http.server
    import json as _json
    import threading
    from urllib.parse import parse_qs, urlparse

    recs = [{"_id": i, "v": i * 10} for i in range(5)]
    log = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            log.append({"auth": self.headers.get("Authorization"), "path": self.path})
            if self.headers.get("Authorization") != "Token t0k":
                self.send_response(401)
                self.end_headers()
                return
            q = parse_qs(urlparse(self.path).query)
            start, limit = int(q["start"][0]), int(q["limit"][0])
            body = {"results": recs[start : start + limit], "count": len(recs)}
            payload = _json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        client = connectors.kobo_client(base, "t0k")
        fetch_page = connectors.kobo_page_fetcher(client, "aXYZ")
        src = connectors.PaginatedSource(
            connectors.iter_limit_start_pages(fetch_page, limit=2),
            str(tmp_path / "landing_kobo_auth"),
            id_col="_id",
        )
        df = src.fetch_submissions(spark)
        assert df.count() == 5
        assert log and all(
            c["path"].startswith("/api/v2/assets/aXYZ/data/") for c in log
        )
        assert all(c["auth"] == "Token t0k" for c in log)
    finally:
        srv.shutdown()


def test_airtable_upsert_sink_payload_shape(spark):
    srv, base, log = _serve_api({"/v0/app1/sites": {}}, require_auth="Bearer k")
    try:
        client = connectors.airtable_client(base, "k")
        sink = connectors.airtable_upsert_sink(client, "app1", "sites", batch_size=10)
        df = spark.createDataFrame(
            [("rec1", "palma"), (None, "mocimboa")], ["airtable_id", "site"]
        ).coalesce(1)
        sink.write(df)
        patches = [r for r in log if r["method"] == "PATCH"]
        posts = [r for r in log if r["method"] == "POST"]
        assert len(patches) == 1 and len(posts) == 1
        assert patches[0]["path"] == "/v0/app1/sites"
        assert patches[0]["body"] == {
            "records": [{"fields": {"site": "palma"}, "id": "rec1"}]
        }
        assert posts[0]["body"] == {"records": [{"fields": {"site": "mocimboa"}}]}
    finally:
        srv.shutdown()


def test_rest_client_retry_after_http_date_falls_back_to_backoff():
    # RFC 7231 allows an HTTP-date Retry-After; must not crash the task
    import http.server
    import threading

    hits = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(1)
            if len(hits) == 1:
                self.send_response(429)
                self.send_header("Retry-After", "Fri, 14 Aug 2026 07:00:00 GMT")
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(b'{"ok": true}')

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        naps = []
        client = connectors.RestClient(
            f"http://127.0.0.1:{srv.server_address[1]}", backoff_s=0.01,
            sleep=naps.append,
        )
        assert client.get_json("/x") == {"ok": True}
        assert naps == [0.01]  # fell back to our own backoff
    finally:
        srv.shutdown()


def test_rest_client_caps_excessive_retry_after():
    # a throttling server saying "Retry-After: 86400" must not stall the
    # Spark task for a day — the sleep is capped at max_wait_s
    import http.server
    import threading

    hits = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(1)
            if len(hits) == 1:
                self.send_response(429)
                self.send_header("Retry-After", "86400")
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(b'{"ok": true}')

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        naps = []
        client = connectors.RestClient(
            f"http://127.0.0.1:{srv.server_address[1]}", max_wait_s=0.5,
            sleep=naps.append,
        )
        assert client.get_json("/x") == {"ok": True}
        assert naps == [0.5]  # 86400 capped to max_wait_s
    finally:
        srv.shutdown()


def test_kobo_fetcher_rejects_missing_count():
    calls = []

    class FakeClient:
        def get_json(self, path, params=None):
            calls.append(params)
            return {"results": [{"_id": 1}]}  # no "count"

    fetch_page = connectors.kobo_page_fetcher(FakeClient(), "a1")
    with pytest.raises(ValueError, match="count"):
        fetch_page(0, 10)


def test_write_sorted_nonoverlapping_file_ranges(spark, tmp_path):
    from pyspark.sql import functions as F

    from peskas_mozambique_data_pipeline_spark.io.parquet_io import write_sorted

    df = spark.range(0, 10_000).select(
        (F.col("id") * 2654435761 % 10_000).alias("k"), F.col("id").alias("v")
    )
    path = str(tmp_path / "sorted")
    write_sorted(df, path, ["k"], n_files=4)
    back = spark.read.parquet(path).select(
        "k", F.input_file_name().alias("f")
    )
    ranges = back.groupBy("f").agg(
        F.min("k").alias("lo"), F.max("k").alias("hi"), F.count("*").alias("n")
    ).collect()
    assert len(ranges) >= 2
    # files form disjoint key ranges -> range predicates prune files
    spans = sorted((r.lo, r.hi) for r in ranges)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import contextlib
    import io as _io

    from pyspark.sql import functions as F

    from peskas_mozambique_data_pipeline_spark.io.parquet_io import write_bucketed

    left = spark.range(0, 2000).select(F.col("id").alias("k"), F.lit(1).alias("a"))
    right = spark.range(0, 2000).select(F.col("id").alias("k"), F.lit(2).alias("b"))
    write_bucketed(left, "t_bleft", ["k"], n_buckets=4)
    write_bucketed(right, "t_bright", ["k"], n_buckets=4)
    try:
        # hint forces the merge path (AQE would broadcast a table this
        # small, hiding the layout); at fact×fact scale SMJ is what
        # the planner picks anyway and the bucket layout feeds it
        # shuffle-free
        joined = spark.table("t_bleft").hint("merge").join(
            spark.table("t_bright").hint("merge"), "k"
        )
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        # co-located layout: the join runs with ZERO exchanges
        assert "Exchange" not in plan
        assert joined.count() == 2000
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


def test_compact_zone_preserves_hive_partitioning(spark, tmp_path):
    zone = str(tmp_path / "zone")
    df = spark.range(0, 400).withColumn("part", (F.col("id") % 2).cast("string"))
    parquet_io.write_versioned(
        df.repartition(8), zone, "t", partition_by=["part"]
    )
    p2 = parquet_io.compact_zone(
        spark, zone, "t", target_mb=64, partition_by=["part"]
    )
    import os

    subdirs = {d for d in os.listdir(p2) if d.startswith("part=")}
    assert subdirs == {"part=0", "part=1"}
    back = spark.read.parquet(p2)
    assert back.count() == 400
    assert back.filter(F.col("part") == "1").count() == 200


def test_vacuum_zone_retention_and_catalog_cleanup(spark, tmp_path):
    """vacuum_zone (r8): superseded snapshots and their bucketed
    catalog entries go; kept versions (read_latest + time travel) are
    untouched; keep_last >= 1 is enforced."""
    import os

    zone = str(tmp_path / "zone")
    os.makedirs(zone)
    paths = []
    # v1 is a bucketed external snapshot -> catalog entry must be
    # dropped with it; v2/v3/v4 plain versioned writes
    df = spark.createDataFrame([(i, i % 4) for i in range(100)], "k long, b int")
    paths.append(
        parquet_io.write_bucketed_versioned(
            df, zone, "trips", bucket_cols=["b"], n_buckets=2, git_sha="v1"
        )
    )
    for sha in ("v2", "v3", "v4"):
        time.sleep(1.1)
        paths.append(parquet_io.write_versioned(df, zone, "trips", git_sha=sha))
    # an unrelated prefix in the same zone must survive any vacuum
    other = parquet_io.write_versioned(df, zone, "trips_extra", git_sha="x")

    t1 = parquet_io.bucket_table_name(os.path.basename(paths[0]))
    assert spark.catalog.tableExists(t1)
    assert parquet_io.list_versions(zone, "trips") == [
        os.path.basename(p) for p in paths
    ]

    removed = parquet_io.vacuum_zone(spark, zone, "trips", keep_last=2)
    assert removed == paths[:2]
    assert not os.path.exists(paths[0]) and not os.path.exists(paths[1])
    assert not spark.catalog.tableExists(t1)  # catalog entry dropped
    # read_latest unaffected; time travel to KEPT versions unaffected
    assert parquet_io.latest_version_path(zone, "trips") == paths[3]
    assert spark.read.parquet(paths[2]).count() == 100
    assert parquet_io.read_latest(spark, zone, "trips").count() == 100
    assert os.path.exists(other)  # other prefix untouched

    # idempotent: nothing left to remove at keep_last=2
    assert parquet_io.vacuum_zone(spark, zone, "trips", keep_last=2) == []
    with pytest.raises(ValueError):
        parquet_io.vacuum_zone(spark, zone, "trips", keep_last=0)


def test_bucketed_versioned_same_second_no_collision(spark, tmp_path):
    """Two same-prefix bucketed snapshots in the same wall-clock second
    (two compactions, or two test zones sharing the session catalog)
    must not collide on the catalog table name: the writer probes for
    an unused (path, table) pair, latest resolves to the later write,
    and both stay readable through the catalog."""
    import os

    df1 = spark.createDataFrame([(1, 0)], "k long, b int")
    df2 = spark.createDataFrame([(2, 0), (3, 1)], "k long, b int")
    zone = str(tmp_path / "zone")
    os.makedirs(zone)
    p1 = parquet_io.write_bucketed_versioned(
        df1, zone, "snap", bucket_cols=["b"], n_buckets=2, git_sha="s"
    )
    p2 = parquet_io.write_bucketed_versioned(
        df2, zone, "snap", bucket_cols=["b"], n_buckets=2, git_sha="s"
    )
    assert p1 != p2
    assert parquet_io.latest_version_path(zone, "snap") == p2
    assert parquet_io.read_latest_bucketed(spark, zone, "snap").count() == 2
    assert spark.read.parquet(p1).count() == 1

    # cross-ZONE collision through the shared catalog (the flaky-sweep
    # class): same prefix+sha in a different zone dir, same second
    zone2 = str(tmp_path / "zone2")
    os.makedirs(zone2)
    p3 = parquet_io.write_bucketed_versioned(
        df1, zone2, "snap", bucket_cols=["b"], n_buckets=2, git_sha="s"
    )
    assert parquet_io.read_latest_bucketed(spark, zone2, "snap").count() == 1
    assert os.path.dirname(p3) == zone2


def test_write_versioned_bloom_filters(spark, tmp_path):
    """bloom_cols wires parquet bloom filters into the zone write: the
    bloom-enabled snapshot carries the filter bytes (strictly larger
    files for identical data/codec) and point lookups on the hashed
    key read back correctly through pushdown."""
    import glob
    import os

    from pyspark.sql import functions as F

    from peskas_mozambique_data_pipeline_spark.io import parquet_io

    df = (
        spark.range(20000)
        .select(
            F.col("id").alias("doc_id"),
            F.md5(F.col("id").cast("string")).alias("digest"),
        )
        .coalesce(1)
    )
    plain = parquet_io.write_versioned(df, str(tmp_path), "plain")
    bloom = parquet_io.write_versioned(
        df, str(tmp_path), "bloomed", bloom_cols=["digest"]
    )

    def data_bytes(path):
        return sum(
            os.path.getsize(f) for f in glob.glob(path + "/*.parquet")
        )

    assert data_bytes(bloom) > data_bytes(plain) + 1024  # filter bytes present

    probe = spark.range(1).select(
        F.md5(F.lit("137")).alias("digest")
    ).first()["digest"]
    got = (
        spark.read.parquet(bloom).filter(F.col("digest") == probe).collect()
    )
    assert [r.doc_id for r in got] == [137]


def test_zone_manifest_layout_invariant_fingerprint(spark, tmp_path):
    rows = [(i, f"doc {i}", float(i) / 7) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, text string, score double")
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    df.repartition(1).write.parquet(a)
    # different layout AND column order: fingerprint must not move
    df.select("score", "id", "text").repartition(7).write.parquet(b)

    ma = parquet_io.zone_manifest(spark, a).collect()
    mb = parquet_io.zone_manifest(spark, b).collect()
    assert sum(r.n_rows for r in ma) == 200 == sum(r.n_rows for r in mb)
    assert len(ma) == 1 and len(mb) == 7  # per-file manifests differ
    fa = parquet_io.zone_fingerprint(spark, a)
    fb = parquet_io.zone_fingerprint(spark, b)
    assert fa == fb  # (n_rows, content_fp) identical across layouts

    # any changed row moves the zone fingerprint
    tampered = [(i, f"doc {i}", float(i) / 7) for i in range(199)] + [
        (199, "doc 199 TAMPERED", 199.0 / 7)
    ]
    c = str(tmp_path / "c")
    spark.createDataFrame(
        tampered, "id long, text string, score double"
    ).write.parquet(c)
    assert parquet_io.zone_fingerprint(spark, c) != fa


def test_verify_zone_statuses(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "id long, v string"
    )
    zone = str(tmp_path / "z")
    df.repartition(2).write.parquet(zone)
    manifest = parquet_io.zone_manifest(spark, zone).localCheckpoint()

    # untouched zone: empty mismatch frame
    assert parquet_io.verify_zone(spark, zone, manifest).count() == 0

    # corrupt one recorded entry -> changed; invent one -> missing;
    # drop one -> the real file reports extra
    files = sorted(r.file for r in manifest.collect())
    doctored = (
        manifest.withColumn(
            "content_fp",
            F.when(F.col("file") == files[0], F.lit("123")).otherwise(
                F.col("content_fp")
            ),
        )
        .filter(F.col("file") != files[1])
        .union(
            spark.createDataFrame(
                [("ghost.parquet", 9, "9")], "file string, n_rows long, content_fp string"
            )
        )
    )
    got = {
        (r.file, r.status)
        for r in parquet_io.verify_zone(spark, zone, doctored).collect()
    }
    assert got == {
        (files[0], "changed"),
        (files[1], "extra"),
        ("ghost.parquet", "missing"),
    }


def test_zone_manifest_keys_by_relative_path(spark, tmp_path):
    """partitionBy writes reuse identical part-file basenames across
    partition dirs; manifest rows must key on the zone-relative path so
    a deleted partition dir verifies as 'missing', not 'changed'
    (ADVICE r11 #1)."""
    import shutil

    df = spark.createDataFrame(
        [(i, i % 2, f"v{i}") for i in range(40)], "id long, p int, v string"
    )
    zone = str(tmp_path / "pz")
    df.repartition(1).write.partitionBy("p").parquet(zone)
    manifest = parquet_io.zone_manifest(spark, zone).localCheckpoint()
    files = sorted(r.file for r in manifest.collect())
    # one manifest row per partition dir, keyed through it
    assert len(files) == 2
    assert files[0].startswith("p=0/") and files[1].startswith("p=1/")
    assert parquet_io.verify_zone(spark, zone, manifest).count() == 0

    shutil.rmtree(str(tmp_path / "pz" / "p=1"))
    got = {
        (r.file, r.status)
        for r in parquet_io.verify_zone(spark, zone, manifest).collect()
    }
    assert got == {(files[1], "missing")}


def test_zone_fingerprint_empty_zone_is_identity(spark, tmp_path):
    """A zero-row snapshot folds to (0, '0') instead of raising on the
    NULL SUM (ADVICE r11 #2)."""
    zone = str(tmp_path / "ez")
    spark.createDataFrame([], "id long, v string").write.parquet(zone)
    assert parquet_io.zone_fingerprint(spark, zone) == (0, "0")


def test_manifest_sidecar_lifecycle(spark, tmp_path):
    zone = str(tmp_path / "zone")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(30)], "id long, v string"
    )
    path = parquet_io.write_versioned(df, zone, "release", manifest=True)
    # the sidecar is invisible to ordinary readers of the snapshot
    assert parquet_io.read_latest(spark, zone, "release").count() == 30
    assert spark.read.parquet(path).columns == ["id", "v"]
    # untouched release verifies clean
    assert parquet_io.verify_latest(spark, zone, "release").count() == 0
    # a tampered data file is caught by the recompute
    import glob
    import os as _os

    victim = sorted(
        f for f in glob.glob(_os.path.join(path, "*.parquet"))
    )[0]
    spark.createDataFrame([(999, "EVIL")], "id long, v string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "evil"))
    evil = glob.glob(str(tmp_path / "evil" / "*.parquet"))[0]
    import shutil

    shutil.copyfile(evil, victim)
    # drop Hadoop's local-FS checksum sidecar so the tamper reaches
    # our verifier instead of tripping ChecksumFileSystem first (a
    # remote object store has no such sidecar — this test models it)
    crc = _os.path.join(
        _os.path.dirname(victim), f".{_os.path.basename(victim)}.crc"
    )
    if _os.path.exists(crc):
        _os.remove(crc)
    got = parquet_io.verify_latest(spark, zone, "release").collect()
    assert {r.status for r in got} == {"changed"}
    # an intermediate (manifest-less) write refuses verification
    parquet_io.write_versioned(df, zone, "hot")
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="manifest"):
        parquet_io.verify_latest(spark, zone, "hot")


def test_seal_zone_idempotent_and_verifiable(spark, tmp_path):
    from peskas_mozambique_data_pipeline_spark.plans.pipeline import (
        PipelineZones,
    )

    zones = PipelineZones(str(tmp_path))
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "id long, v string"
    )
    zones.write(df, "corpus_packs")
    fp1 = zones.seal(spark, "corpus_packs")
    fp2 = zones.seal(spark, "corpus_packs")  # idempotent: sidecar kept
    assert fp1 == fp2 and fp1[0] == 40
    assert zones.verify(spark, "corpus_packs").count() == 0
    # a NEW version is a new release: sealing it records its own
    # sidecar; content identical -> identical fingerprint
    time.sleep(1.1)  # distinct second-resolution version name
    zones.write(df, "corpus_packs")
    fp3 = zones.seal(spark, "corpus_packs")
    assert fp3 == fp1


def test_provenance_sidecar_records_input_versions(spark, tmp_path):
    from peskas_mozambique_data_pipeline_spark.plans.pipeline import (
        PipelineZones,
    )

    zones = PipelineZones(str(tmp_path))
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    zones.write(df, "corpus_ingested")
    zones.write(df, "corpus_deduped")
    zones.write(df, "training_shards")
    prov = zones.record_provenance(
        "training_shards", ["corpus_ingested", "corpus_deduped", "absent"]
    )
    assert prov["corpus_ingested"] == zones.version_ts("corpus_ingested")
    assert prov["corpus_deduped"] == zones.version_ts("corpus_deduped")
    assert prov["absent"] is None
    assert zones.provenance("training_shards") == prov
    # the sidecar is invisible to parquet readers of the snapshot
    assert zones.read(spark, "training_shards").count() == 1
    # a NEW product version carries no inherited provenance
    time.sleep(1.1)
    zones.write(df, "training_shards")
    with pytest.raises(FileNotFoundError, match="provenance"):
        zones.provenance("training_shards")


def test_md5_fingerprint_fold_duckdb_parity(spark):
    """The engine-portable (md5) manifest fold replays bit-for-bit in
    DuckDB over the same parquet — the cross-engine release check:
    group documents by source, sum the 15-hex-digit md5 row
    fingerprints as exact integers, compare digit strings."""
    import duckdb

    src = "/root/testdata/sf0.001/documents.parquet"
    df = spark.read.parquet(src)
    cols = sorted(df.columns)
    got = {
        (r.source, r.n, r.fp)
        for r in df.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(parquet_io.row_fingerprint(cols, "md5"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("fp"),
        )
        .collect()
    }
    # concat_ws in BOTH engines: same skip-NULL semantics, so a
    # nullable column cannot null out the whole key on one side only
    key = "concat_ws(chr(31), " + ", ".join(
        f"CAST({c} AS VARCHAR)" for c in cols
    ) + ")"
    con = duckdb.connect()
    want = set(
        con.execute(
            f"""
            SELECT source, COUNT(*) AS n,
                   CAST(SUM(CAST(('0x' || substr(md5({key}), 1, 15))
                                 AS BIGINT)::HUGEINT) AS VARCHAR) AS fp
            FROM read_parquet('{src}') GROUP BY source
            """
        ).fetchall()
    )
    con.close()
    assert got == want and len(got) >= 2


def test_row_diff_statuses_and_multiset_semantics(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40), (4, "d", 40)],
        "id long, v string, n long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10),            # unchanged -> absent from the diff
         (2, "B", 20),            # changed value
         (4, "d", 40),            # one of the duplicate pair dropped
         (5, "e", 50)],           # added key
        "id long, v string, n long",
    )
    got = {(r.id, r.status) for r in parquet_io.row_diff(old, new, ["id"]).collect()}
    assert got == {(2, "changed"), (3, "removed"), (4, "changed"), (5, "added")}
    # column order must not matter (name-sorted fingerprint)
    got2 = {
        (r.id, r.status)
        for r in parquet_io.row_diff(
            old.select("n", "id", "v"), new, ["id"]
        ).collect()
    }
    assert got2 == got
    # identical releases diff empty
    assert parquet_io.row_diff(old, old.select("n", "v", "id"), ["id"]).count() == 0


def test_schema_diff_reports_drift_only(spark):
    import pyspark.sql.functions as SF

    old = spark.createDataFrame([(1, "a", 1.5)], "id long, v string, x double")
    new = (
        old.drop("x")
        .withColumn("y", SF.lit(2))
        .withColumn("v", SF.col("v").cast("binary"))
    )
    got = {
        (r.column, r.status, r.old_type, r.new_type)
        for r in parquet_io.schema_diff(old, new).collect()
    }
    assert got == {
        ("x", "removed", "double", None),
        ("y", "added", None, "int"),
        ("v", "retyped", "string", "binary"),
    }
    assert parquet_io.schema_diff(old, old.select("x", "id", "v")).count() == 0


def test_time_travel_read_as_of_and_history(spark, tmp_path):
    """read_as_of resolves the newest snapshot at-or-before a stamp
    (stable under later writes — the reader half of immutability);
    version_history reports every snapshot with files/bytes/seal."""
    from datetime import datetime, timedelta, timezone

    zone = str(tmp_path / "zone")
    t0 = datetime(2026, 1, 2, 3, 4, 5, tzinfo=timezone.utc)
    d1 = spark.range(0, 5).withColumn("v", F.lit("one"))
    d2 = spark.range(0, 7).withColumn("v", F.lit("two"))
    d3 = spark.range(0, 9).withColumn("v", F.lit("three"))
    parquet_io.write_versioned(d1, zone, "t", now=t0)
    parquet_io.write_versioned(d2, zone, "t", now=t0 + timedelta(hours=1))
    parquet_io.write_versioned(d3, zone, "t", now=t0 + timedelta(days=1))

    # exact stamp, between-stamps, prefix, and end-of-day semantics
    assert parquet_io.read_as_of(spark, zone, "t", "20260102030405").count() == 5
    assert parquet_io.read_as_of(spark, zone, "t", "20260102035959").count() == 5
    assert parquet_io.read_as_of(spark, zone, "t", "20260102040405").count() == 7
    assert parquet_io.read_as_of(spark, zone, "t", "20260102").count() == 7
    assert parquet_io.read_as_of(spark, zone, "t", "2026").count() == 9
    import pytest

    with pytest.raises(FileNotFoundError):
        parquet_io.read_as_of(spark, zone, "t", "20251231")
    # latest unaffected
    assert parquet_io.read_latest(spark, zone, "t").count() == 9

    hist = parquet_io.version_history(zone, "t")
    assert [h["version"] for h in hist] == [
        "20260102030405", "20260102040405", "20260103030405"
    ]
    assert all(h["n_files"] >= 1 and h["n_bytes"] > 0 for h in hist)
    assert not any(h["sealed"] for h in hist)
    parquet_io.seal_zone(spark, zone, "t")
    hist2 = parquet_io.version_history(zone, "t")
    assert hist2[-1]["sealed"] and not hist2[0]["sealed"]
    # the seal's own manifest parquet is not counted as data
    assert hist2[-1]["n_files"] == hist[-1]["n_files"]


def test_zones_time_travel_wrappers(spark, tmp_path):
    from datetime import datetime, timedelta, timezone

    from peskas_mozambique_data_pipeline_spark.plans.pipeline import (
        PipelineZones,
    )

    zones = PipelineZones(str(tmp_path))
    t0 = datetime(2026, 2, 1, 0, 0, 0, tzinfo=timezone.utc)
    parquet_io.write_versioned(
        spark.range(3), str(tmp_path), "z", now=t0
    )
    parquet_io.write_versioned(
        spark.range(6), str(tmp_path), "z", now=t0 + timedelta(hours=2)
    )
    # prefix stamps are end-of-period: end-of-hour-00 sees only the
    # first write; end-of-day sees both
    assert zones.read_as_of(spark, "z", "2026020100").count() == 3
    assert zones.read_as_of(spark, "z", "20260201").count() == 6
    assert zones.read(spark, "z").count() == 6
    assert len(zones.history("z")) == 2


def test_zone_lifecycle_end_to_end(spark, tmp_path):
    """The full zone lifecycle in one scenario: versioned writes,
    zorder compaction, seal + verify, time travel across every stamp,
    history, then vacuum — retained reads stay stable, vacuumed stamps
    resolve to nothing (time travel is bounded by retention, the
    documented contract)."""
    from datetime import datetime, timedelta, timezone

    zone = str(tmp_path / "zone")
    t0 = datetime(2026, 3, 1, 12, 0, 0, tzinfo=timezone.utc)
    d1 = spark.range(0, 100).withColumn("x", F.col("id") % 8).withColumn(
        "y", F.col("id") % 5
    )
    d2 = d1.withColumn("x", F.col("x") + 1)
    parquet_io.write_versioned(d1.repartition(6), zone, "life", now=t0)
    parquet_io.write_versioned(
        d2.repartition(6), zone, "life", now=t0 + timedelta(minutes=5)
    )
    # zorder compaction lands as a NEW version (immutable zone)
    parquet_io.compact_zone(
        spark, zone, "life", target_mb=256, zorder_by=["x", "y"],
        zorder_bits=3,
    )
    assert len(parquet_io.list_versions(zone, "life")) == 3
    # seal the release and verify clean
    parquet_io.seal_zone(spark, zone, "life")
    bad = parquet_io.verify_latest(spark, zone, "life").collect()
    assert bad == []
    hist = parquet_io.version_history(zone, "life")
    assert [h["sealed"] for h in hist] == [False, False, True]
    # time travel: first stamp sees d1, +5min sees d2, latest == d2
    at0 = parquet_io.read_as_of(spark, zone, "life", "20260301120000")
    assert at0.agg(F.sum("x")).first()[0] == d1.agg(F.sum("x")).first()[0]
    at5 = parquet_io.read_as_of(spark, zone, "life", "202603011205")
    assert at5.agg(F.sum("x")).first()[0] == d2.agg(F.sum("x")).first()[0]
    # vacuum to the newest 1: reads of the survivor stay stable,
    # vacuumed stamps no longer resolve
    parquet_io.vacuum_zone(spark, zone, "life", keep_last=1)
    assert parquet_io.read_latest(spark, zone, "life").count() == 100
    import pytest

    with pytest.raises(FileNotFoundError):
        parquet_io.as_of_version_path(zone, "life", "20260301120000")
    assert len(parquet_io.version_history(zone, "life")) == 1


def test_as_of_version_path_rejects_nonstamp_input(tmp_path):
    # '2026-08-16' compares lexicographically ('-' < '0') against the
    # 14-digit stamp and would silently resolve an old snapshot —
    # anything but a digit-prefix of a stamp must raise
    for bad in ("2026-08-16", "2026/08", "latest", "", "202608161234567"):
        with pytest.raises(ValueError):
            parquet_io.as_of_version_path(str(tmp_path), "t", bad)
