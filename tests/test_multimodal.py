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


def _png_chunks(ihdr_body, idat_raw, plte=None):
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_body)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(idat_raw)) + chunk(b"IEND", b"")


def test_png_16bit_reduces_to_high_byte():
    import struct

    import numpy as np

    from rabbit_in_a_blender_spark.ext.multimodal import _png_pixels

    rng = np.random.default_rng(3)
    px16 = rng.integers(0, 65536, size=(4, 7, 3), dtype=np.uint16)
    raw = b"".join(
        b"\x00" + px16[y].astype(">u2").tobytes() for y in range(4)
    )
    blob = _png_chunks(struct.pack(">IIBBBBB", 7, 4, 16, 2, 0, 0, 0), raw)
    w, h, back = _png_pixels(blob)
    assert (w, h) == (7, 4)
    assert (back == (px16 >> 8).astype(np.uint8)).all()


def test_png_adam7_interlaced_roundtrip():
    """Adam7: seven independently filtered sub-images reassemble to the
    exact original (mixed filter types across passes)."""
    import struct

    import numpy as np

    from rabbit_in_a_blender_spark.ext.multimodal import _ADAM7, _png_pixels

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    parts = []
    for pi, (x0, y0, dx, dy) in enumerate(_ADAM7):
        sub = px[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            line = sub[y].tobytes()
            if pi % 2 == 0 or y == 0:  # filter 0
                parts.append(b"\x00" + line)
            else:  # filter 2 (Up) against the previous pass row
                prev = sub[y - 1].astype(np.int32)
                cur = sub[y].astype(np.int32)
                parts.append(
                    b"\x02"
                    + ((cur - prev) & 0xFF).astype(np.uint8).tobytes()
                )
    blob = _png_chunks(
        struct.pack(">IIBBBBB", 13, 11, 8, 2, 0, 0, 1), b"".join(parts)
    )
    w, h, back = _png_pixels(blob)
    assert (w, h) == (13, 11)
    assert (back == px).all()


def test_png_4bit_palette_and_1bit_gray():
    import struct

    import numpy as np

    from rabbit_in_a_blender_spark.ext.multimodal import _png_pixels

    # 4-bit palette, 5 px wide (odd → padded nibble at row end)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 7, 7]) + bytes(12)
    idx = [[0, 1, 2, 3, 0], [3, 2, 1, 0, 1]]
    raw = b""
    for row in idx:
        packed = bytearray([0])  # filter 0
        for i in range(0, len(row), 2):
            hi = row[i] << 4
            lo = row[i + 1] if i + 1 < len(row) else 0
            packed.append(hi | lo)
        raw += bytes(packed)
    blob = _png_chunks(
        struct.pack(">IIBBBBB", 5, 2, 4, 3, 0, 0, 0), raw, plte=pal
    )
    w, h, back = _png_pixels(blob)
    assert (w, h) == (5, 2)
    assert tuple(back[0, 1]) == (0, 255, 0) and tuple(back[1, 0]) == (7, 7, 7)

    # 1-bit grayscale, 10 px wide: bit 1 → 255, bit 0 → 0
    bits = [1, 0, 1, 1, 0, 0, 1, 0, 1, 1]
    packed = bytearray([0])
    acc = 0
    for i, b in enumerate(bits):
        acc = (acc << 1) | b
        if i % 8 == 7:
            packed.append(acc)
            acc = 0
    packed.append(acc << 6)  # 10 % 8 = 2 leftover bits, left-aligned
    blob = _png_chunks(
        struct.pack(">IIBBBBB", 10, 1, 1, 0, 0, 0, 0), bytes(packed)
    )
    w, h, back = _png_pixels(blob)
    assert (w, h) == (10, 1)
    assert [int(v) for v in back[0, :, 0]] == [b * 255 for b in bits]
