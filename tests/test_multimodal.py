from __future__ import annotations

from peskas_mozambique_data_pipeline_spark.operators import multimodal


def _media(spark):
    return spark.createDataFrame(
        [
            (1, "image", bytearray(b"\x01\x02\x03\x04"), 64, 64, None),
            (2, "video", bytearray(b"\xff" * 100), 640, 480, 3000),
            (3, "image", None, None, None, None),
        ],
        multimodal.MEDIA_SCHEMA,
    )


def test_decode_media_batch_shape(spark):
    out = multimodal.decode_media(_media(spark), batch_size=2)
    got = {r.asset_id: r for r in out.collect()}
    assert got[1].n_bytes == 4
    assert len(got[1].feature) == 8
    assert got[3].n_bytes == 0 and got[3].feature == [0.0] * 8
    # deterministic fake: same bytes -> same feature
    again = {r.asset_id: r.feature for r in multimodal.decode_media(_media(spark)).collect()}
    assert again[2] == got[2].feature


def test_frame_sample_explodes_video_only(spark):
    out = multimodal.frame_sample(_media(spark), every_ms=1000).collect()
    assert sorted(r.frame_ms for r in out) == [0, 1000, 2000, 3000]
    assert {r.asset_id for r in out} == {2}


def test_resize_stub_sets_metadata(spark):
    out = multimodal.resize_stub(_media(spark), 224, 224)
    assert all(r.meta_width == 224 for r in out.collect())


def test_audio_windows_sine_wave_features(spark):
    import numpy as np

    # 100 ms of 16 kHz mono PCM: a 1 kHz sine at half amplitude plus a
    # stretch of silence — RMS and zero-crossings are analytically known
    sr = 16_000
    t = np.arange(sr // 10) / sr
    sine = (0.5 * 32767 * np.sin(2 * np.pi * 1000 * t)).astype("<i2")
    silence = np.zeros(sr // 10, dtype="<i2")
    rows = [
        (1, "audio", sine.tobytes(), None, None, 100),
        (2, "audio", silence.tobytes(), None, None, 100),
        (3, "image", b"\x00" * 64, 8, 8, None),  # filtered out
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.audio_windows(df, window_ms=25, hop_ms=10, sample_rate=sr)
    got = out.collect()
    assert {r.asset_id for r in got} == {1, 2}
    # 1600-sample signal, 400-sample window, 160 hop -> 8 frames each
    by_id = {}
    for r in got:
        by_id.setdefault(r.asset_id, []).append(r)
    assert len(by_id[1]) == 8 and len(by_id[2]) == 8
    f0 = sorted(by_id[1], key=lambda r: r.win_start_ms)[0]
    # sine RMS = A/sqrt(2) ~ 0.3536 * 32767 ~ 11585; allow 2% window error
    assert abs(f0.rms - 0.5 * 32767 / np.sqrt(2)) < 0.02 * 32767
    # 1 kHz over 25 ms -> ~25 cycles -> ~50 zero crossings
    assert 45 <= f0.zero_crossings <= 55
    assert all(r.rms == 0.0 and r.zero_crossings == 0 for r in by_id[2])
    assert f0.n_samples == 400
