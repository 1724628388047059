"""The image tier of the persistent-dedup family: incremental Hamming
index lifecycle — stream maintenance, cross-batch pair detection,
stream ≡ batch parity with ``multimodal.hamming_near_dup_pairs``,
compaction equivalence, read-only probe, anti-join filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import multimodal
from peskas_mozambique_data_pipeline_spark.streaming import hamming_index as hi
from peskas_mozambique_data_pipeline_spark.streaming import ingest as si
import pytest

# hand-picked 64-bit hashes (bit 63 clear): A/A1 differ by 1 bit,
# B/B2 differ by 3 bits, C is far from everything
H_A = 0x00F0F0F0F0F0F0F0
H_A1 = H_A ^ (1 << 17)
H_B = 0x0123456789ABCDEF
H_B2 = H_B ^ (1 << 3) ^ (1 << 40) ^ (1 << 55)
H_C = 0x0055AA55AA55AA55


def _write(spark, landing, rows):
    df = spark.createDataFrame(rows, "asset_id long, dhash long")
    df.coalesce(1).write.mode("append").parquet(landing)
    return df.schema


def _run(spark, landing, schema, zone, ck, **kw):
    stream = si.stream_landing_zone(spark, landing, schema, max_files_per_trigger=1)
    q, index_dir, pairs_dir = hi.stream_hamming_index(stream, zone, ck, **kw)
    q.awaitTermination(120)
    return index_dir, pairs_dir


def test_incremental_hamming_index_cross_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")

    schema = _write(spark, landing, [(1, H_A), (2, H_B)])
    index_dir, pairs_dir = _run(spark, landing, schema, zone, ck)
    assert spark.read.parquet(pairs_dir).count() == 0

    # batch 2: 3 near-dups the INDEXED asset 1; 4/5 are an exact
    # in-batch pair; 6 matches nothing
    _write(spark, landing, [(3, H_A1), (4, H_C), (5, H_C), (6, H_B2 ^ (1 << 9))])
    index_dir, pairs_dir = _run(spark, landing, schema, zone, ck)

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in spark.read.parquet(pairs_dir).drop("batch").collect()
    }
    assert got[(1, 3)] == 1          # cross-batch, exact distance
    assert got[(4, 5)] == 0          # within-batch exact dup
    # asset 6 is H_B2 ^ bit9 = 4 bits from the indexed H_B — right AT
    # max_hamming, so the pigeonhole banding must still surface it
    assert got[(2, 6)] == bin(H_B ^ (H_B2 ^ (1 << 9))).count("1") == 4
    assert set(got) == {(1, 3), (4, 5), (2, 6)}

    idx = hi.read_index_parts(spark, index_dir, zone + "/" + hi.COMPACT_SUBDIR)
    all_ids = set()
    for part in idx:
        if part is not None:
            all_ids |= {r.asset_id for r in part.select("asset_id").distinct().collect()}
    assert all_ids == {1, 2, 3, 4, 5, 6}


def test_stream_equals_batch_operator(spark, tmp_path):
    """Accumulated stream pairs == one-shot hamming_near_dup_pairs on
    the full frame (same banding, same threshold)."""
    rows = [(1, H_A), (2, H_B), (3, H_A1), (4, H_C), (5, H_C), (6, H_B2)]
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, rows[:2])
    _write(spark, landing, rows[2:4])
    _write(spark, landing, rows[4:])
    _, pairs_dir = _run(spark, landing, schema, zone, ck)

    stream_pairs = {
        (r.id_a, r.id_b, r.hamming)
        for r in spark.read.parquet(pairs_dir).drop("batch").collect()
    }
    batch = multimodal.hamming_near_dup_pairs(
        spark.createDataFrame(rows, "asset_id long, dhash long"), max_hamming=4
    )
    batch_pairs = {(r.id_a, r.id_b, r.hamming) for r in batch.collect()}
    assert stream_pairs == batch_pairs and len(batch_pairs) >= 3


@pytest.mark.slow
def test_compaction_preserves_probe_results(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, [(1, H_A), (2, H_B)])
    _write(spark, landing, [(3, H_C)])
    probe = spark.createDataFrame(
        [(100, H_A1), (101, H_B2), (102, 0x0000DEAD0000BEEF)],
        "asset_id long, dhash long",
    )

    # run WITHOUT compaction, snapshot state absent
    index_dir, _ = _run(spark, landing, schema, zone, ck, compact_every=None)
    before = {
        (r.new_id, r.index_id, r.hamming)
        for r in hi.probe_hamming_index(probe, zone).collect()
    }
    assert (100, 1, 1) in before and (101, 2, 3) in before
    assert not any(nid == 102 for nid, _, _ in before)

    # replay the same landing data into a second zone WITH compaction
    zone2, ck2 = str(tmp_path / "zone2"), str(tmp_path / "ck2")
    index_dir2, _ = _run(
        spark, landing, schema, zone2, ck2, compact_every=1
    )
    after = {
        (r.new_id, r.index_id, r.hamming)
        for r in hi.probe_hamming_index(probe, zone2).collect()
    }
    assert after == before
    # compaction actually folded: no live delta dirs remain
    import os
    assert not [
        d for d in os.listdir(index_dir2) if d.startswith("batch=")
    ] if os.path.isdir(index_dir2) else True


def test_filter_against_hamming_index(spark, tmp_path):
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, [(1, H_A), (2, H_B)])
    _run(spark, landing, schema, zone, ck)

    incoming = spark.createDataFrame(
        [(10, H_A1, "dup-of-1"), (11, H_C, "fresh")],
        "asset_id long, dhash long, note string",
    )
    out = hi.filter_against_hamming_index(incoming, zone)
    rows = {(r.asset_id, r.note) for r in out.collect()}
    assert rows == {(11, "fresh")}  # survivor keeps its full row


def test_hamming_snapshot_probe_bucketed_and_restart_idempotent(spark, tmp_path):
    """After compaction the probe's snapshot side reads through the
    bucketed catalog table (at most the probe-side (band, bucket)
    exchange in the plan); restarting the maintenance stream with no
    new data recomputes nothing."""
    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    schema = _write(spark, landing, [(1, H_A), (2, H_B)])
    _write(spark, landing, [(3, H_C)])
    index_dir, pairs_dir = _run(
        spark, landing, schema, zone, ck, compact_every=1
    )
    n_pairs = spark.read.parquet(pairs_dir).count()

    probe = spark.createDataFrame(
        [(100, H_A1)], "asset_id long, dhash long"
    )
    plan = (
        hi.probe_hamming_index(probe, zone)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
    assert plan.count("Exchange hashpartitioning(band") <= 1, plan

    # restart with no new data: same checkpoint, nothing recomputes
    index_dir, pairs_dir = _run(
        spark, landing, schema, zone, ck, compact_every=1
    )
    assert spark.read.parquet(pairs_dir).count() == n_pairs


def test_png_blobs_to_zone_composition(spark, tmp_path):
    """The demo path as a sweep test: PNG blobs → decode → dhash →
    landing → streamed into the zone; a brightness-shifted re-crawl
    pairs with its indexed original (dhash-exact) and the ingest
    filter drops it."""
    import struct
    import zlib

    from peskas_mozambique_data_pipeline_spark.operators import multimodal

    W_, H_ = 16, 12

    def png_gray(px):
        def chunk(typ, data):
            c = struct.pack(">I", len(data)) + typ + data
            return c + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

        raw = bytearray()
        for y in range(H_):
            raw.append(0)
            raw.extend(px[y])
        ihdr = struct.pack(">IIBBBBB", W_, H_, 8, 0, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
        )

    def pattern(seed):
        return [
            [(x * (31 + seed) + y * 17 + seed * 97) % 251 for x in range(W_)]
            for y in range(H_)
        ]

    landing = str(tmp_path / "landing")
    zone = str(tmp_path / "zone")
    ck = str(tmp_path / "ck")
    blobs = spark.createDataFrame(
        [(i, "image", png_gray(pattern(i)), W_, H_, None) for i in range(4)],
        multimodal.MEDIA_SCHEMA,
    )
    hashes = multimodal.image_dhash(blobs)
    hashes.coalesce(1).write.parquet(landing)
    _run(spark, landing, hashes.schema, zone, ck)

    bright = [[min(255, v + 3) for v in row] for row in pattern(2)]
    incoming = multimodal.image_dhash(
        spark.createDataFrame(
            [(100, "image", png_gray(bright), W_, H_, None),
             (101, "image", png_gray(pattern(9)), W_, H_, None)],
            multimodal.MEDIA_SCHEMA,
        )
    ).localCheckpoint()
    probed = {
        (r.new_id, r.index_id)
        for r in hi.probe_hamming_index(incoming, zone).collect()
    }
    assert (100, 2) in probed
    kept = sorted(
        r.asset_id
        for r in hi.filter_against_hamming_index(incoming, zone).collect()
    )
    assert kept == [101]
