"""Multimodal plumbing: binary columns through mapInPandas."""

from __future__ import annotations

from rabbit_in_a_blender_spark.ext.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
)


def _media(spark):
    rows = [
        (1, "image", "image/png", bytes([0, 40, 80, 255] * 25), 10, 10, None),
        (2, "audio", "audio/wav", bytes(range(200)), None, None, 5000),
        (3, "video", "video/mp4", None, None, None, 3500),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_shapes(spark):
    out = {r["media_id"]: r for r in extract_features(_media(spark)).collect()}
    assert len(out) == 3
    assert out[1]["n_bytes"] == 100
    assert len(out[1]["feature"]) == 8
    assert abs(sum(out[1]["feature"]) - 1.0) < 1e-6  # histogram normalized
    assert out[3]["n_bytes"] == 0  # null payload handled


def test_frame_sample_plan(spark):
    frames = frame_sample_plan(_media(spark), every_ms=1000).collect()
    # video is 3500 ms → frames at 0,1000,2000,3000
    assert sorted(r["frame_ts_ms"] for r in frames) == [0, 1000, 2000, 3000]
    assert {r["media_id"] for r in frames} == {3}


def test_resize_images(spark):
    from rabbit_in_a_blender_spark.ext.multimodal import resize_images

    rows = [
        (1, "image", "image/png", bytes(range(100)) * 4, 512, 256, None),
        (2, "image", "image/png", bytes(range(100)), 100, 50, None),
        (3, "audio", "audio/wav", bytes(range(10)), None, None, 1000),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_images(media, 256, 256).collect()}
    assert set(out) == {1, 2}, "non-images filtered out"
    assert (out[1]["width"], out[1]["height"]) == (256, 128)
    assert len(out[1]["payload"]) == 100  # area ratio 0.25 of 400 bytes
    assert (out[2]["width"], out[2]["height"]) == (100, 50)
    assert len(out[2]["payload"]) == 100  # under the cap: untouched
