"""Streaming Bloom membership ledger: bit-exact stream ≡ batch filter
parity (OR semilattice), no false negatives across batches, compaction
bounds dirs, saturation tile."""

from __future__ import annotations

import os

from peskas_mozambique_data_pipeline_spark.operators import sketches as sk
from peskas_mozambique_data_pipeline_spark.streaming import bloom_ledger as bl
from peskas_mozambique_data_pipeline_spark.streaming import ingest as si
import pytest


def _write(spark, landing, rows):
    df = spark.createDataFrame(rows, "doc_id long, url string, source string")
    df.coalesce(1).write.mode("append").parquet(landing)
    return df.schema


def _rows(lo, hi, source):
    return [(i, f"https://ex.org/{i}", source) for i in range(lo, hi)]


@pytest.mark.slow
def test_stream_filter_equals_batch_and_never_misses(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, _rows(0, 150, "s1"))
    _write(spark, landing, _rows(100, 300, "s2"))
    _write(spark, landing, _rows(250, 400, "s1"))

    stream = si.stream_landing_zone(
        spark, landing, schema, max_files_per_trigger=1
    )
    q, _ = bl.stream_bloom_ledger(
        stream, zone, ck, value_col="url", group_cols=["source"],
        compact_every=2,
    )
    q.awaitTermination(120)

    got = {
        r.source: tuple(r.bloom)
        for r in bl.read_filter(spark, zone, ["source"]).collect()
    }
    whole = spark.read.parquet(landing)
    want = {
        r.source: tuple(r.bloom)
        for r in sk.bloom_pack(
            sk.bloom_bits(whole, "url", ["source"]), ["source"]
        ).collect()
    }
    assert got == want  # OR semilattice through compaction, bit for bit

    # no false negatives: every carried url probes maybe_seen per group
    probes = whole.select("source", "url").distinct()
    out = bl.ledger_probe(spark, zone, probes, "url", ["source"]).collect()
    assert all(r.maybe_seen for r in out) and len(out) > 300
    # unseen values mostly probe false at this occupancy
    fresh = spark.createDataFrame(
        [("s1", f"https://other.org/{i}") for i in range(500)],
        "source string, url string",
    )
    fp = sum(
        r.maybe_seen
        for r in bl.ledger_probe(spark, zone, fresh, "url", ["source"]).collect()
    )
    assert fp < 250  # deterministic, well under saturation

    occ = {
        r.source: (r.bloom_bits_set, r.bloom_fpp)
        for r in bl.ledger_occupancy(spark, zone, ["source"]).collect()
    }
    assert set(occ) == {"s1", "s2"}
    for bits, fpp in occ.values():
        assert 0 < bits <= sk.BLOOM_M and 0 < fpp < 1

    # dirs stay bounded after compaction
    live = [
        d
        for d in os.listdir(os.path.join(zone, bl.BLOOM_SUBDIR))
        if d.startswith("batch=")
    ]
    assert len(live) < 3


def test_restart_is_idempotent(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, _rows(0, 200, "s1"))
    stream = si.stream_landing_zone(
        spark, landing, schema, max_files_per_trigger=1
    )
    q, _ = bl.stream_bloom_ledger(
        stream, zone, ck, value_col="url", group_cols=["source"]
    )
    q.awaitTermination(120)
    before = {
        r.source: tuple(r.bloom)
        for r in bl.read_filter(spark, zone, ["source"]).collect()
    }
    stream2 = si.stream_landing_zone(
        spark, landing, schema, max_files_per_trigger=1
    )
    q2, _ = bl.stream_bloom_ledger(
        stream2, zone, ck, value_col="url", group_cols=["source"]
    )
    q2.awaitTermination(120)
    after = {
        r.source: tuple(r.bloom)
        for r in bl.read_filter(spark, zone, ["source"]).collect()
    }
    assert before == after


def test_frontier_filter_seen_drops_carried_keeps_fresh(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, _rows(0, 200, "s1"))
    stream = si.stream_landing_zone(
        spark, landing, schema, max_files_per_trigger=1
    )
    q, _ = bl.stream_bloom_ledger(stream, zone, ck, value_col="url")
    q.awaitTermination(120)

    frontier = spark.createDataFrame(
        [(f"https://ex.org/{i}",) for i in range(150, 250)]
        + [(f"https://new.org/{i}",) for i in range(50)],
        "url string",
    )
    out = bl.frontier_filter_seen(spark, zone, frontier).collect()
    kept = {r.url for r in out}
    # every carried url (150..199) is gone — no re-enqueue, ever
    assert not any(u in kept for u in (f"https://ex.org/{i}" for i in range(150, 200)))
    # the 100 unseen urls survive modulo the (low) occupancy fpp
    assert 95 <= len(kept) <= 100
    assert any("new.org" in u for u in kept)
    # cold start: a zone with no state passes the frontier through
    assert (
        bl.frontier_filter_seen(spark, str(tmp_path / "empty"), frontier).count()
        == frontier.count()
    )
