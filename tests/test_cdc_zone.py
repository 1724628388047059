"""Merge-on-read CDC zone: stream ≡ batch apply_cdc state, compaction
preserves state / drops tombstones / bounds dirs, restart idempotency,
and the strict read guard."""

from __future__ import annotations

import os

import pytest

from peskas_mozambique_data_pipeline_spark.operators.merge import apply_cdc
from peskas_mozambique_data_pipeline_spark.streaming import cdc_zone as cz
from peskas_mozambique_data_pipeline_spark.streaming import ingest as si

SCHEMA = "k long, seq long, op string, name string, v long"


def _write(spark, landing, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("append").parquet(landing)
    return df.schema


def _run(spark, landing, zone, ck, schema, **kw):
    stream = si.stream_landing_zone(
        spark, landing, schema, max_files_per_trigger=1
    )
    q, d = cz.stream_cdc_zone(stream, zone, ck, ["k"], **kw)
    q.awaitTermination(120)
    return d


def _state(spark, zone):
    df = cz.read_cdc_state(spark, zone, ["k"])
    return sorted((r.k, r.name, r.v) for r in df.collect())


def _want(spark, landing):
    changes = spark.read.parquet(landing)
    empty = spark.createDataFrame([], "k long, name string, v long")
    return sorted(
        (r.k, r.name, r.v)
        for r in apply_cdc(empty, changes, ["k"]).collect()
    )


def test_stream_state_equals_batch_apply_cdc(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    schema = _write(spark, landing, [
        (1, 1, "upsert", "a", 10), (2, 2, "upsert", "b", 20),
    ])
    _write(spark, landing, [
        (1, 3, "upsert", "a2", 11), (3, 4, "upsert", "c", 30),
    ])
    _write(spark, landing, [
        (2, 5, "delete", None, None), (4, 6, "upsert", "d", 40),
    ])
    _run(spark, landing, zone, str(tmp_path / "ck"), schema)
    got = _state(spark, zone)
    assert got == _want(spark, landing)
    assert got == [(1, "a2", 11), (3, "c", 30), (4, "d", 40)]


@pytest.mark.slow
def test_compaction_drops_tombstones_and_preserves_state(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    schema = _write(spark, landing, [(1, 1, "upsert", "a", 10)])
    seq = 2
    for i in range(6):
        rows = [(10 + i, seq, "upsert", f"n{i}", i), (10 + i, seq + 1, "delete", None, None)]
        seq += 2
        _write(spark, landing, rows)
    _run(spark, landing, zone, str(tmp_path / "ck"), schema, compact_every=3)
    assert _state(spark, zone) == _want(spark, landing) == [(1, "a", 10)]
    # the snapshot holds winners only: no tombstone rows inside
    comp = os.path.join(zone, cz.CDC_COMPACT_SUBDIR)
    snap = spark.read.parquet(
        os.path.join(comp, sorted(os.listdir(comp))[-1])
    )
    assert snap.filter("op = 'delete'").count() == 0
    # delta dirs bounded by the compaction cadence
    n_batches = len(
        [d for d in os.listdir(os.path.join(zone, cz.CDC_SUBDIR))
         if d.startswith("batch=")]
    )
    assert n_batches < 7
    # a key deleted pre-compaction STAYS deleted, and a later re-insert
    # out-ranks the dropped tombstone exactly as it would have anyway
    _write(spark, landing, [(10, seq, "upsert", "back", 99)])
    _run(spark, landing, zone, str(tmp_path / "ck"), schema, compact_every=3)
    assert _state(spark, zone) == [(1, "a", 10), (10, "back", 99)]


def test_restart_is_idempotent(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, [
        (1, 1, "upsert", "a", 10), (1, 2, "upsert", "a2", 11),
    ])
    _run(spark, landing, zone, ck, schema)
    first = _state(spark, zone)
    _run(spark, landing, zone, ck, schema)  # no new data
    assert _state(spark, zone) == first == [(1, "a2", 11)]
    _write(spark, landing, [(1, 3, "delete", None, None)])
    _run(spark, landing, zone, ck, schema)
    assert _state(spark, zone) == []


def test_strict_read_guard(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    schema = _write(spark, landing, [
        (1, 1, "upsert", "a", 10), (1, 1, "upsert", "dup", 11),
    ])
    _run(spark, landing, zone, str(tmp_path / "ck"), schema)
    with pytest.raises(Exception) as ei:
        cz.read_cdc_state(spark, zone, ["k"]).collect()
    assert "duplicate (key, seq)" in str(ei.value)
    # non-strict resolves (documented: upstream must enforce uniqueness)
    assert cz.read_cdc_state(spark, zone, ["k"], strict=False).count() == 1


@pytest.mark.slow
def test_late_low_seq_batch_rejected_after_compaction(spark, tmp_path):
    """ADVICE r13: compaction drops tombstones on the promise that seq
    is globally monotonic across batches.  The zone now records the
    folded high-water mark and REJECTS a late batch at or below it —
    the resurrection path is closed before the delta lands."""
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    schema = _write(spark, landing, [(1, 1, "upsert", "a", 10)])
    _write(spark, landing, [
        (2, 2, "upsert", "b", 20), (2, 3, "delete", None, None),
    ])
    _write(spark, landing, [(3, 4, "upsert", "c", 30)])
    _run(spark, landing, zone, str(tmp_path / "ck"), schema,
         compact_every=3)
    # compaction at batch 2 folded batches 0-1: key 2's tombstone
    # (seq 3) dropped, high-water mark recorded
    assert cz.max_folded_seq(spark, zone) == 3
    before = _state(spark, zone)
    assert before == [(1, "a", 10), (3, "c", 30)]
    # a late change with seq <= the mark would resurrect key 2 —
    # the maintenance query must fail, and the delta must not land
    _write(spark, landing, [(2, 2, "upsert", "zombie", 99)])
    with pytest.raises(Exception) as ei:
        _run(spark, landing, zone, str(tmp_path / "ck"), schema,
             compact_every=3)
    assert "max folded seq" in str(ei.value)
    assert _state(spark, zone) == before
    # (the legal path — a re-sequenced change with seq above the mark —
    # is the re-insert case test_compaction_drops_tombstones covers)
