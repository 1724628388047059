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
