"""Image-dedup-at-volume demo: the full blob→zone path for the image
tier — synthetic PNGs → stdlib decode (`multimodal.decode_png`) →
perceptual hash (`image_dhash`) → landing zone → incremental Hamming
index (`streaming/hamming_index.py`) → read-only probe → anti-join
filter.

Proves the pieces compose end to end exactly as a crawl pipeline would
run them: batch 1 indexes the known corpus, batch 2 arrives with
near-duplicate re-crawls (brightness-shifted and patch-edited copies)
that must pair with their ALREADY-INDEXED originals, and a follow-up
shard is probed read-only then filtered before ingest.

Usage: python tools/image_dedup_demo.py
"""

from __future__ import annotations

import os
import shutil
import struct
import sys
import tempfile
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from peskas_mozambique_data_pipeline_spark.operators import multimodal
from peskas_mozambique_data_pipeline_spark.session import get_spark
from peskas_mozambique_data_pipeline_spark.streaming import hamming_index as hi
from peskas_mozambique_data_pipeline_spark.streaming import ingest as si

W, H = 32, 24


def _png_gray(pixels) -> bytes:
    """Minimal grayscale PNG (filter 0 rows, stdlib only) — the same
    public spec multimodal.decode_png implements."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + typ + data
        return c + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    raw = bytearray()
    for y in range(H):
        raw.append(0)
        raw.extend(pixels[y])
    ihdr = struct.pack(">IIBBBBB", W, H, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _pattern(seed: int):
    """Deterministic textured gradient — distinct dhash per seed."""
    return [
        [
            (x * (3 + seed % 5) + y * (2 + seed % 7) + (seed * 37) + ((x * y + seed) % 11) * 9)
            % 256
            for x in range(W)
        ]
        for y in range(H)
    ]


def _brighten(px, delta=3):
    return [[min(255, v + delta) for v in row] for row in px]


def _patch(px):
    out = [row[:] for row in px]
    for y in range(4):
        for x in range(4):
            out[y][x] = 255 - out[y][x]
    return out


def main() -> int:
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="image_dedup_demo_")
    landing = os.path.join(work, "landing")
    zone = os.path.join(work, "zone")
    ck = os.path.join(work, "ck")
    t0 = time.time()

    def media_rows(assets):
        return spark.createDataFrame(
            [(i, "image", blob, W, H, None) for i, blob in assets],
            multimodal.MEDIA_SCHEMA,
        )

    def land(assets):
        hashes = multimodal.image_dhash(media_rows(assets))
        hashes.coalesce(1).write.mode("append").parquet(landing)
        return hashes.schema

    # batch 1: 20 distinct originals
    originals = [(i, _png_gray(_pattern(i))) for i in range(20)]
    schema = land(originals)
    q, index_dir, pairs_dir = hi.stream_hamming_index(
        si.stream_landing_zone(spark, landing, schema, max_files_per_trigger=1),
        zone, ck,
    )
    q.awaitTermination(120)
    n_pairs_b1 = spark.read.parquet(pairs_dir).count()

    # batch 2: re-crawls — 10 brightness-shifted copies (dhash-exact)
    # + 5 patch-edited copies (near) + 5 fresh patterns
    recrawls = (
        [(100 + i, _png_gray(_brighten(_pattern(i)))) for i in range(10)]
        + [(200 + i, _png_gray(_patch(_pattern(i)))) for i in range(5)]
        + [(300 + i, _png_gray(_pattern(50 + i))) for i in range(5)]
    )
    land(recrawls)
    q2, _, _ = hi.stream_hamming_index(
        si.stream_landing_zone(spark, landing, schema, max_files_per_trigger=1),
        zone, ck,
    )
    q2.awaitTermination(120)

    pairs = spark.read.parquet(pairs_dir).drop("batch")
    cross = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    # original-vs-recrawl pairs only (recrawl-vs-recrawl pairs of the
    # same pattern are also found — correct, tallied separately)
    bright_hits = sum(1 for (a, b) in cross if a < 20 and b == a + 100)
    patch_hits = sum(1 for (a, b) in cross if a < 20 and b == a + 200)

    # read-only probe + ingest filter on a third shard: one more
    # brightened copy of original 3 and one fresh pattern
    shard = media_rows(
        [(400, _png_gray(_brighten(_pattern(3), 2))), (401, _png_gray(_pattern(99)))]
    )
    shard_hashes = multimodal.image_dhash(shard).localCheckpoint()
    probe = hi.probe_hamming_index(shard_hashes, zone)
    probed = {(r.new_id, r.index_id) for r in probe.collect()}
    kept = hi.filter_against_hamming_index(shard_hashes, zone)
    kept_ids = sorted(r.asset_id for r in kept.collect())
    wall = time.time() - t0

    print(f"batch1 pairs: {n_pairs_b1}   total pairs: {len(cross)}")
    print(f"brightened re-crawls paired with originals: {bright_hits}/10")
    print(f"patch-edited re-crawls paired with originals: {patch_hits}/5")
    print(f"probe matches: {sorted(probed)}")
    print(f"ingest filter kept: {kept_ids}   wall: {wall:.1f}s")

    ok = (
        n_pairs_b1 == 0
        and bright_hits == 10
        and (400, 3) in probed
        and kept_ids == [401]
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    print("image dedup demo OK" if ok else "image dedup demo FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
