"""Multimodal → similarity composition demo: every modality's
featurizer lands in the SAME engine surface.

- images: PNG blobs → decode → `image_resize` → thumbnail pixel
  vectors → brute-force cosine top-k (a brightness-shifted re-crawl
  retrieves its original at rank 1);
- audio: PCM arrays → `log_mel_spectrogram` → `mean_pool_embeddings`
  per asset → cosine top-k (a re-recorded tone retrieves the same
  tone, not the different-pitch one);
- video: raw blobs → `raw_video_frames` → `frame_dhash` →
  `hamming_near_dup_pairs` (shared scene across videos).

Proves the typed-column design intent: decode/resize/featurize are the
modality-specific front doors, and everything downstream — ANN, dedup,
drift — is modality-agnostic over `array<float>`/BIGINT-hash columns.

Usage: python tools/multimodal_demo.py
"""

from __future__ import annotations

import os
import struct
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from peskas_mozambique_data_pipeline_spark.operators import multimodal
from peskas_mozambique_data_pipeline_spark.operators import similarity as sim
from peskas_mozambique_data_pipeline_spark.session import get_spark

W, H = 16, 12


def _png_gray(px) -> bytes:
    def chunk(typ, data):
        c = struct.pack(">I", len(data)) + typ + data
        return c + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    raw = bytearray()
    for y in range(H):
        raw.append(0)
        raw.extend(px[y])
    ihdr = struct.pack(">IIBBBBB", W, H, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )


def _pattern(seed):
    return [
        [(x * (31 + seed) + y * 17 + seed * 97) % 251 for x in range(W)]
        for y in range(H)
    ]


def main() -> int:
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    ok = True

    # ---- images: resize → pixel vectors → cosine top-1
    blobs = [(i, "image", _png_gray(_pattern(i)), W, H, None) for i in range(8)]
    query_blob = [(100, "image",
                   _png_gray([[min(255, v + 3) for v in row] for row in _pattern(5)]),
                   W, H, None)]
    media = spark.createDataFrame(blobs + query_blob, multimodal.MEDIA_SCHEMA)
    vecs = multimodal.image_resize(media, width=8, height=6).select(
        F.col("asset_id").alias("vec_id"),
        F.transform("pixels", lambda p: p.cast("double")).alias("embedding"),
    ).localCheckpoint()
    top = sim.cosine_topk(
        vecs.filter("vec_id = 100").select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        vecs.filter("vec_id < 100"),
        k=1,
    ).collect()
    img_hit = top and top[0]["neighbor_id"] == 5
    ok &= bool(img_hit)
    print(f"image: re-crawl of pattern 5 retrieves -> {top[0]['neighbor_id']} "
          f"(cos {top[0]['cosine_sim']:.4f})")

    # ---- audio: log-mel → mean-pool → cosine top-1
    import numpy as np

    sr = 16_000
    t = np.arange(sr // 4)

    def tone(freq, phase=0.0):
        return [int(x) for x in
                (9000 * np.sin(2 * np.pi * freq * t / sr + phase)).astype(np.int64)]

    pcm = spark.createDataFrame(
        [(1, tone(440)), (2, tone(1000)), (3, tone(2500)),
         (100, tone(1000, phase=0.7))],
        "asset_id long, samples array<long>",
    )
    mel = multimodal.log_mel_spectrogram(pcm, n_fft=400, hop=160, n_mels=40)
    pooled = sim.mean_pool_embeddings(
        mel.select(F.col("asset_id"), F.col("log_mel").alias("embedding")),
        group_col="asset_id",
    ).select(F.col("asset_id").alias("vec_id"), F.col("embedding")).localCheckpoint()
    atop = sim.cosine_topk(
        pooled.filter("vec_id = 100").select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        pooled.filter("vec_id < 100"),
        k=1,
    ).collect()
    aud_hit = atop and atop[0]["neighbor_id"] == 2
    ok &= bool(aud_hit)
    print(f"audio: re-recorded 1 kHz tone retrieves -> {atop[0]['neighbor_id']} "
          f"(cos {atop[0]['cosine_sim']:.4f})")

    # ---- audio near-dup: energy-delta fingerprints → Hamming banding
    # (the exact-integer dedup tier next to the log-mel retrieval tier).
    # Inputs are noise-burst "recordings" with varying energy envelopes
    # — steady pure tones are the degenerate input for delta-sign
    # fingerprints (near-constant frame energy, the audio analog of
    # blank images for dhash), which is exactly why the dedup tier and
    # the retrieval tier key on different features.  A re-leveled
    # (gain ×3) copy of recording 11 fingerprints identically.
    def recording(seed, n=16_000):
        return [((i * 37 + seed * 101) % 211) - 105 for i in range(n)]

    fam = spark.createDataFrame(
        [(10, recording(1)), (11, recording(2)), (12, recording(3)),
         (210, [3 * x for x in recording(2)])],
        "asset_id long, samples array<long>",
    )
    fps = multimodal.audio_fingerprint(fam)
    apairs = sorted(
        (r.id_a, r.id_b)
        for r in multimodal.audio_near_dup_pairs(
            fps, max_hamming=4, min_matching_words=1
        ).collect()
    )
    dup_hit = apairs == [(11, 210)]
    ok &= bool(dup_hit)
    print(f"audio-dedup: re-leveled copy pairs with its original -> {apairs}")

    # ---- video: frames → dhash → cross-video shared scene
    def tex(seed):
        y, x = np.mgrid[0:H, 0:W]
        return ((x * (2654435761 + seed) + y * 40503 + seed * 97) % 251).astype(
            np.uint8
        )

    def rawvid(frames):
        return b"".join(f.tobytes() for f in frames)

    v = spark.createDataFrame(
        [(1, "video", rawvid([tex(1), tex(2)]), W, H, None),
         (2, "video", rawvid([tex(3), tex(1)]), W, H, None)],
        multimodal.MEDIA_SCHEMA,
    )
    frames = multimodal.raw_video_frames(
        v, width=W, height=H, channels=1, fps=1, every_ms=1000
    )
    hashes = multimodal.frame_dhash(frames, width=W, height=H, channels=1)
    pairs = multimodal.hamming_near_dup_pairs(
        hashes.select(
            (F.col("asset_id") * 1000 + F.col("frame_idx")).alias("fid"), "dhash"
        ),
        max_hamming=0,
        id_col="fid",
    ).collect()
    vid_hit = {(r.id_a, r.id_b) for r in pairs} == {(1000, 2001)}
    ok &= vid_hit
    print(f"video: shared scene across videos -> {sorted((r.id_a, r.id_b) for r in pairs)}")

    print(f"wall: {time.time() - t0:.1f}s")
    spark.stop()
    print("multimodal demo OK" if ok else "multimodal demo FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
