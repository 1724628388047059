"""WARC connector tests: synthetic archives written in-test (plain and
member-gzip), read back through the real ``binaryFile`` → ``mapInPandas``
path, HTTP envelope split, and documents projection."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.io.warc import (
    digest_doc_id,
    gunzip_members,
    http_payload,
    parse_warc_records,
    read_warc,
    split_http_payload,
    warc_to_documents,
)


def _record(warc_type: str, payload: bytes, **headers: str) -> bytes:
    lines = [b"WARC/1.0"]
    hdrs = {
        "WARC-Type": warc_type,
        "WARC-Record-ID": f"<urn:uuid:{warc_type}-{len(payload)}>",
        "Content-Length": str(len(payload)),
        **headers,
    }
    for k, v in hdrs.items():
        lines.append(f"{k}: {v}".encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _archive() -> list[bytes]:
    return [
        _record("warcinfo", b"software: test\r\n"),
        _record(
            "response",
            _http("<html>alpha page é</html>".encode()),
            **{
                "WARC-Target-URI": "http://a.example/x",
                "WARC-Date": "2026-08-15T00:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
        ),
        _record(
            "response",
            _http(b"not found", status=404),
            **{"WARC-Target-URI": "http://a.example/missing"},
        ),
        _record(
            "response",
            _http(b"\x89PNG pixels", ctype="image/png"),
            **{"WARC-Target-URI": "http://a.example/img.png"},
        ),
        _record(
            "request",
            b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n",
            **{"WARC-Target-URI": "http://a.example/x"},
        ),
    ]


def test_parse_warc_records_plain():
    data = b"".join(_archive())
    recs = list(parse_warc_records(data))
    assert [h["warc-type"] for _, h, _ in recs] == [
        "warcinfo",
        "response",
        "response",
        "response",
        "request",
    ]
    # Content-Length framing is exact: payload of the 404 record.
    assert recs[2][2].endswith(b"not found")


def test_gunzip_members_roundtrip():
    members = [gzip.compress(r) for r in _archive()]
    assert gunzip_members(b"".join(members)) == b"".join(_archive())


def test_split_http_payload():
    status, head, body = split_http_payload(_http(b"hello"))
    assert status == 200 and b"hello" == body
    assert "Content-Type: text/html" in head
    # Non-HTTP payloads pass through untouched.
    assert split_http_payload(b"raw") == (None, None, b"raw")


def test_read_warc_spark_both_layouts(spark, tmp_path):
    plain_dir = tmp_path / "warc"
    plain_dir.mkdir()
    (plain_dir / "a.warc").write_bytes(b"".join(_archive()))
    (plain_dir / "b.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in _archive())
    )
    df = read_warc(spark, str(plain_dir)).cache()
    # Both layouts parse identically: 5 records each.
    counts = {
        os.path.basename(r["warc_file"]): r["n"]
        for r in df.groupBy("warc_file").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"a.warc": 5, "b.warc.gz": 5}
    row = (
        df.filter(df.target_uri == "http://a.example/x")
        .filter(df.warc_type == "response")
        .first()
    )
    assert row["warc_date"] == "2026-08-15T00:00:00Z"
    assert bytes(row["payload"]).startswith(b"HTTP/1.1 200")

    http = http_payload(df).cache()
    # request + warcinfo records never reach the HTTP split.
    assert http.count() == 6  # 3 responses per file
    ok = http.filter(http.http_status == 200)
    assert ok.count() == 4  # html + png per file

    docs = warc_to_documents(http)
    got = docs.collect()
    # Only 200-status text/* responses survive; both files carry the
    # same body bytes, so the content-addressed doc_id collapses them.
    assert len(got) == 2
    assert len({r["doc_id"] for r in got}) == 1
    body = "<html>alpha page é</html>".encode()
    assert got[0]["doc_id"] == digest_doc_id(body)
    assert got[0]["text"] == body.decode()
    assert got[0]["n_chars"] == len(body.decode())
    assert got[0]["url"] == "http://a.example/x"
    df.unpersist()
    http.unpersist()


def test_read_warc_batches_bound_arrow(spark, tmp_path):
    """A file with more records than batch_records still yields all of
    them (the bounded-batch yield path)."""
    d = tmp_path / "many"
    d.mkdir()
    recs = []
    for i in range(20):
        recs.append(
            _record(
                "response",
                _http(f"doc {i}".encode(), ctype="text/plain"),
                **{"WARC-Target-URI": f"http://m.example/{i}"},
            )
        )
    (d / "m.warc").write_bytes(b"".join(recs))
    df = read_warc(spark, str(d), batch_records=7)
    assert df.count() == 20
    docs = warc_to_documents(http_payload(df, batch_records=3))
    assert docs.count() == 20
    assert docs.select("doc_id").distinct().count() == 20


def test_parse_warc_records_tolerant_resync():
    recs = _archive()
    # corrupt stretch between two valid records: strict raises, skip
    # resyncs at the next WARC/ line and loses only the garbage
    blob = recs[0] + b"GARBAGE not a record\r\nmore junk\r\n" + recs[1]
    try:
        list(parse_warc_records(blob))
        raised = False
    except ValueError:
        raised = True
    assert raised
    got = list(parse_warc_records(blob, on_error="skip"))
    types = [h.get("warc-type") for _, h, _ in got]
    assert types == ["warcinfo", "response"]
    # and an unknown mode is rejected loudly
    try:
        list(parse_warc_records(blob, on_error="quarantine"))
        assert False
    except ValueError:
        pass


def test_read_warc_skip_mode_and_long_content_length(spark, tmp_path):
    recs = _archive()
    blob = recs[0] + b"JUNKJUNK\r\nnoise\r\n" + recs[1] + recs[4]
    p = tmp_path / "dirty.warc"
    p.write_bytes(blob)
    df = read_warc(spark, str(p), on_error="skip")
    # content_length survives as BIGINT (>2 GiB records at crawl scale)
    assert dict(df.dtypes)["content_length"] == "bigint"
    rows = df.collect()
    assert [r["warc_type"] for r in rows] == ["warcinfo", "response", "request"]


def test_cdx_index_and_random_access_fetch(spark, tmp_path):
    """CDX capture index + fetch_by_cdx: the index locates records by
    canonical URL, and the fetch re-reads ONLY the referenced records
    from the archive (member-gzip layout included)."""
    import gzip

    from peskas_mozambique_data_pipeline_spark.io.warc import (
        build_cdx,
        fetch_by_cdx,
    )

    recs = _archive()
    root = tmp_path / "archive"
    root.mkdir()
    (root / "a.warc").write_bytes(b"".join(recs))
    (root / "b.warc.gz").write_bytes(
        b"".join(gzip.compress(m) for m in recs)
    )
    records = read_warc(spark, str(root))
    cdx = build_cdx(records)
    rows = cdx.collect()
    # one CDX row per response record per file (3 responses x 2 files)
    assert len(rows) == 6
    assert all(r["digest"] is not None and len(r["digest"]) == 64 for r in rows)
    # canonical key matches the URL-dedup family's key function
    assert {r["canonical_url"] for r in rows} == {
        "a.example/x", "a.example/missing", "a.example/img.png"
    }

    # point lookup -> fetch only that record from the archive
    want = cdx.filter(F.col("canonical_url") == "a.example/x")
    got = fetch_by_cdx(spark, want, str(root)).collect()
    assert len(got) == 2  # same capture in both files
    assert all(r["warc_type"] == "response" for r in got)
    assert all(b"alpha page" in bytes(r["payload"]) for r in got)
    # offsets round-trip exactly
    want_keys = {(r["warc_file"], r["record_offset"]) for r in want.collect()}
    assert {(r["warc_file"], r["record_offset"]) for r in got} == want_keys


def test_cdx_zone_bucketed_lookup(spark, tmp_path):
    from peskas_mozambique_data_pipeline_spark.io.warc import (
        build_cdx,
        save_cdx_zone,
    )
    from peskas_mozambique_data_pipeline_spark.plans.pipeline import (
        PipelineZones,
    )

    p = tmp_path / "c.warc"
    p.write_bytes(b"".join(_archive()))
    zones = PipelineZones(str(tmp_path / "zones"))
    save_cdx_zone(zones, build_cdx(read_warc(spark, str(p))))
    back = zones.read_bucketed(spark, "cdx")
    assert back.count() == 3
    # bucketed-by-key zone: a key-grouped lookup prunes buckets (the
    # groupBy keeps the bucketed scan alive — Spark's
    # DisableUnnecessaryBucketedScan drops it for filter-only reads)
    plan = (
        back.filter(F.col("canonical_url") == "a.example/x")
        .groupBy("canonical_url")
        .agg(F.count(F.lit(1)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SelectedBucketsCount" in plan


def test_stream_warc_documents_matches_batch(spark, tmp_path):
    """Streaming WARC ingest == batch ingest over the same archives."""
    import gzip

    from peskas_mozambique_data_pipeline_spark.io.warc import (
        http_payload as _hp,
        stream_warc_documents,
        warc_to_documents as _w2d,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    recs = _archive()
    (landing / "a.warc").write_bytes(b"".join(recs))
    (landing / "b.warc.gz").write_bytes(
        b"".join(gzip.compress(m) for m in recs)
    )

    docs_stream = stream_warc_documents(
        spark, str(landing), max_files_per_trigger=1
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        docs_stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    batch = _w2d(_hp(read_warc(spark, str(landing))))
    key = lambda df: sorted(
        (r["doc_id"], r["url"], r["text"]) for r in df.collect()
    )
    assert key(got) == key(batch)
    assert got.count() == 2  # one text/200 response per file
