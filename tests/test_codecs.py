"""Pure-stdlib JPEG + GIF codecs (ext/codecs.py) and their wiring into
the multimodal mapInPandas paths.

The encoder/decoder pair could in principle share a compensating bug,
so beyond round-trips these tests pin spec-level facts: marker layout,
zigzag-ordered DQT payloads, DC-only entropy data for solid blocks,
LZW clear-code semantics, GIF little-endian geometry.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rabbit_in_a_blender_spark.ext.codecs import (
    ZIGZAG,
    decode_jpeg,
    encode_gif,
    encode_jpeg,
    gif_frames,
)


def _gradient(h, w):
    g = np.zeros((h, w, 3), np.uint8)
    g[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    g[:, :, 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    g[:, :, 2] = 128
    return g


# ---------------------------------------------------------------------------
# JPEG
# ---------------------------------------------------------------------------


def test_jpeg_solid_color_roundtrip_exact():
    px = np.full((16, 16, 3), 0, np.uint8)
    px[:, :] = (200, 64, 32)
    for sub in (False, True):
        w, h, out = decode_jpeg(encode_jpeg(px, quality=90, subsample=sub))
        assert (w, h) == (16, 16)
        # solid color → DC-only blocks → quantization is exact
        assert np.abs(out.astype(int) - px.astype(int)).max() == 0


def test_jpeg_gradient_roundtrip_tolerance():
    g = _gradient(30, 42)  # not a multiple of 8 or 16 in either dim
    for sub, tol in ((False, 6), (True, 12)):
        w, h, out = decode_jpeg(encode_jpeg(g, quality=90, subsample=sub))
        assert (w, h) == (42, 30)
        err = np.abs(out.astype(int) - g.astype(int))
        assert err.mean() < 4.0 and err.max() <= tol


def test_jpeg_chroma_subsampling_is_mcu_aligned():
    # luma-sharp, chroma-flat: 4:2:0 must match 4:4:4 exactly — any
    # misalignment in MCU interleave or upsample would smear the edges
    cb = np.indices((32, 48)).sum(axis=0) % 2 * 200 + 20
    px = np.repeat(cb[:, :, None], 3, axis=2).astype(np.uint8)
    _, _, full = decode_jpeg(encode_jpeg(px, quality=95, subsample=False))
    _, _, subd = decode_jpeg(encode_jpeg(px, quality=95, subsample=True))
    assert np.array_equal(full, subd)


def test_jpeg_marker_structure_and_zigzag_dqt():
    blob = encode_jpeg(_gradient(8, 8), quality=50)
    assert blob.startswith(b"\xff\xd8\xff\xe0") and blob.endswith(b"\xff\xd9")
    # locate the first DQT and check its payload is the Annex K luma
    # table in ZIGZAG order (T.81 B.2.4.1) at quality 50 (scale = 1.0)
    i = blob.index(b"\xff\xdb")
    (seglen,) = struct.unpack(">H", blob[i + 2 : i + 4])
    body = blob[i + 4 : i + 2 + seglen]
    assert body[0] == 0x00  # 8-bit precision, table id 0
    from rabbit_in_a_blender_spark.ext.codecs import QUANT_LUMA

    expect = QUANT_LUMA.reshape(64)[ZIGZAG].astype(int)
    assert list(body[1:65]) == list(expect)
    # SOF0 geometry is big-endian height, width
    j = blob.index(b"\xff\xc0")
    h, w = struct.unpack(">HH", blob[j + 5 : j + 9])
    assert (w, h) == (8, 8)


def test_jpeg_solid_block_is_dc_only():
    # one 8x8 solid block: entropy segment must be a few bytes (3 DC
    # diffs + 3 EOBs), proving the AC run-length path emits nothing
    px = np.full((8, 8, 3), 77, np.uint8)
    blob = encode_jpeg(px, quality=85)
    sos = blob.index(b"\xff\xda")
    (seglen,) = struct.unpack(">H", blob[sos + 2 : sos + 4])
    entropy = blob[sos + 2 + seglen : -2]
    assert len(entropy) <= 6


def test_jpeg_noise_roundtrip_and_determinism():
    rng = np.random.RandomState(7)
    px = (rng.rand(17, 19, 3) * 255).astype(np.uint8)
    b1 = encode_jpeg(px, quality=95)
    assert b1 == encode_jpeg(px, quality=95)
    w, h, out = decode_jpeg(b1)
    assert (w, h) == (19, 17)
    assert np.abs(out.astype(int) - px.astype(int)).mean() < 8.0


def test_jpeg_restart_markers_roundtrip_identically():
    """DRI/RSTn path: every restart interval must reconstruct the exact
    same pixels as the marker-free encode — this exercises the decoder's
    DC-predictor reset and the pad-byte skip in align_restart (a stuffed
    FF 00 can sit between the entropy data and the marker)."""
    g = _gradient(48, 64)
    for sub in (False, True):
        base = decode_jpeg(encode_jpeg(g, quality=90, subsample=sub))[2]
        for ri in (1, 2, 3, 7):
            blob = encode_jpeg(g, quality=90, subsample=sub, restart_interval=ri)
            assert b"\xff\xdd" in blob  # DRI emitted
            assert any(bytes([0xFF, 0xD0 + k]) in blob for k in range(8))
            dec = decode_jpeg(blob)
            assert dec is not None, (sub, ri)
            assert np.array_equal(dec[2], base), (sub, ri)


def test_jpeg_rejects_non_baseline_gracefully():
    assert decode_jpeg(b"\x89PNG\r\n\x1a\n") is None
    assert decode_jpeg(b"\xff\xd8\xff\xc2" + b"\x00\x10" + b"\x00" * 20) is None
    assert decode_jpeg(b"\xff\xd8" + b"\x00" * 10) is None
    truncated = encode_jpeg(_gradient(16, 16))[:40]
    assert decode_jpeg(truncated) is None


def test_jpeg_quality_monotone_size():
    g = _gradient(32, 32)
    sizes = [len(encode_jpeg(g, quality=q)) for q in (10, 50, 95)]
    assert sizes[0] < sizes[1] < sizes[2]


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


def _two_frames():
    f1 = np.zeros((8, 10, 3), np.uint8)
    f1[:, :5] = (255, 0, 0)
    f1[:, 5:] = (0, 0, 255)
    f2 = np.zeros((8, 10, 3), np.uint8)
    f2[:4] = (0, 255, 0)
    f2[4:] = (255, 255, 0)
    return [(100, f1), (200, f2)]


def test_gif_animated_roundtrip_exact():
    frames = _two_frames()
    blob = encode_gif(frames)
    assert blob.startswith(b"GIF89a") and blob.endswith(b"\x3b")
    w, h = struct.unpack("<HH", blob[6:10])
    assert (w, h) == (10, 8)
    got = gif_frames(blob)
    assert [d for d, _ in got] == [100, 200]
    for (_, g), (_, want) in zip(got, frames):
        assert np.array_equal(g, want)


def test_gif_transparency_composites_previous_frame():
    frames = _two_frames()
    blob = bytearray(encode_gif(frames))
    # patch the SECOND graphic-control extension: set the transparency
    # flag and point the transparent index at frame 2's (0,255,0) color
    gce_positions = []
    i = 0
    while True:
        i = blob.find(b"\x21\xf9", i)
        if i < 0:
            break
        gce_positions.append(i)
        i += 2
    assert len(gce_positions) == 2
    p = gce_positions[1]
    # layout: 21 F9 04 <packed> <delay lo> <delay hi> <transparent idx> 00
    green_index = None
    # palette starts at offset 13; find (0,255,0)
    n = 2 << (blob[10] & 0x07)
    for k in range(n):
        if tuple(blob[13 + 3 * k : 16 + 3 * k]) == (0, 255, 0):
            green_index = k
    assert green_index is not None
    blob[p + 3] |= 0x01
    blob[p + 6] = green_index
    got = gif_frames(bytes(blob))
    assert len(got) == 2
    # frame 2's green top half is now transparent → shows frame 1 pixels
    _, final = got[1]
    _, first = got[0]
    assert np.array_equal(final[:4], first[:4])
    assert np.array_equal(final[4:], frames[1][1][4:])


def test_gif_disposal_modes():
    """Disposal 2 (restore-to-background) and 3 (restore-to-previous)
    change what the NEXT frame composites onto; the fixture draws a
    small patch over frame 1 with transparency so the difference is
    observable in frame 3."""
    import numpy as np

    f1 = np.zeros((6, 6, 3), np.uint8)
    f1[:, :] = (255, 0, 0)
    patch = np.zeros((6, 6, 3), np.uint8)
    patch[:, :] = (0, 0, 255)
    all_trans = np.zeros((6, 6, 3), np.uint8)
    all_trans[:, :] = (0, 255, 0)  # will be marked fully transparent
    blob = bytearray(encode_gif([(10, f1), (10, patch), (10, all_trans)]))
    # find the three GCEs; set frame-2 disposal + frame-3 transparency
    gces = []
    i = 0
    while True:
        i = blob.find(b"\x21\xf9", i)
        if i < 0:
            break
        gces.append(i)
        i += 2
    assert len(gces) == 3
    n = 2 << (blob[10] & 0x07)
    green = next(
        k for k in range(n) if tuple(blob[13 + 3 * k : 16 + 3 * k]) == (0, 255, 0)
    )
    for mode in (2, 3):
        mut = bytearray(blob)
        mut[gces[1] + 3] |= mode << 2  # frame 2 disposal
        mut[gces[2] + 3] |= 0x01  # frame 3: transparency on
        mut[gces[2] + 6] = green  # everything transparent → shows canvas
        got = gif_frames(bytes(mut))
        assert got is not None and len(got) == 3
        # frame 2 itself always shows the blue patch
        assert tuple(got[1][1][3, 3]) == (0, 0, 255)
        final = got[2][1]
        if mode == 2:
            # restored to background color before frame 3
            bg = tuple(blob[13 + 3 * blob[11] : 16 + 3 * blob[11]])
            assert tuple(final[3, 3]) == bg
        else:
            # restored to the pre-patch canvas: frame 1's red
            assert tuple(final[3, 3]) == (255, 0, 0)


def test_gif_interlaced_decodes():
    # hand-build an interlaced variant: reorder rows into pass order and
    # set the interlace flag on the image descriptor
    f = _gradient(8, 4)
    # quantize to few colors so the fixture encoder's palette fits
    f = (f // 64 * 64).astype(np.uint8)
    blob = bytearray(encode_gif([(0, f)]))
    desc = blob.find(b"\x2c")
    assert desc > 0
    # decode the existing (sequential) LZW index stream via the decoder
    # itself, then re-encode rows permuted into interlace pass order
    got0 = gif_frames(bytes(blob))[0][1]
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, 8, step))
    permuted = got0[order]  # rows as they'd appear in the stream
    blob2 = bytearray(encode_gif([(0, permuted)]))
    desc2 = blob2.find(b"\x2c")
    blob2[desc2 + 9] |= 0x40  # interlace flag
    got = gif_frames(bytes(blob2))
    assert got is not None
    assert np.array_equal(got[0][1], got0)


def test_gif_rejects_garbage():
    assert gif_frames(b"notagif") is None
    assert gif_frames(b"GIF89a" + b"\x00" * 4) is None


def test_gif_corrupt_lzw_root_size_rejected_fast():
    """Regression: a mutated LZW minimum-code-size byte (here 0x3d = 61)
    must be rejected, not size the initial code table at 1 << 61 — that
    allocation loop ate tens of GB before any decode error could fire
    (caught live by the fuzz during a full-suite run)."""
    culprit = bytes.fromhex(
        "4749463839610a000800810000ff00000000ffffff0000ff0021f904000a00"
        "00002c000000000a00080000023d04411004c3300c43100441300cc3300441"
        "1004"
    )
    import resource
    import time

    t0 = time.time()
    before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert gif_frames(culprit) is None
    # also the general field sweep: every out-of-spec root size rejects
    base = encode_gif(_two_frames())
    lzw_pos = base.find(b"\x2c") + 10  # descriptor + no LCT → min-code byte
    for bad in (0, 1, 9, 61, 93, 255):
        mut = base[:lzw_pos] + bytes([bad]) + base[lzw_pos + 1 :]
        assert gif_frames(mut) is None, bad
    after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert time.time() - t0 < 5.0
    assert after - before < 1_000_000  # <1GB growth (ru_maxrss is KB)


def test_fuzz_decoders_never_raise():
    """Hypothesis sweep: arbitrary bytes — including mutated valid
    blobs, the adversarial case — must yield a clean None or a decoded
    result, never an exception (the mapInPandas workers rely on it)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rabbit_in_a_blender_spark.ext.codecs import encode_jpeg_progressive

    valid_jpeg = encode_jpeg(_gradient(16, 16), quality=70)
    valid_prog = encode_jpeg_progressive(_gradient(16, 16), quality=70)
    valid_gif = encode_gif(_two_frames())

    @settings(max_examples=150, deadline=None)
    @given(
        st.one_of(
            st.binary(max_size=200),
            st.binary(max_size=200).map(lambda b: b"\xff\xd8" + b),
            st.binary(max_size=200).map(lambda b: b"GIF89a" + b),
            st.tuples(
                st.integers(0, len(valid_jpeg) - 1), st.integers(0, 255)
            ).map(
                lambda t: valid_jpeg[: t[0]]
                + bytes([t[1]])
                + valid_jpeg[t[0] + 1 :]
            ),
            st.tuples(
                st.integers(0, len(valid_prog) - 1), st.integers(0, 255)
            ).map(
                lambda t: valid_prog[: t[0]]
                + bytes([t[1]])
                + valid_prog[t[0] + 1 :]
            ),
            st.tuples(
                st.integers(0, len(valid_gif) - 1), st.integers(0, 255)
            ).map(
                lambda t: valid_gif[: t[0]] + bytes([t[1]]) + valid_gif[t[0] + 1 :]
            ),
        )
    )
    def check(blob):
        from rabbit_in_a_blender_spark.ext.codecs import (
            probe_jpeg,
            probe_mp3,
            probe_mp4,
        )

        for dec in (decode_jpeg, gif_frames, probe_jpeg, probe_mp3, probe_mp4):
            out = dec(blob)
            assert out is None or out  # decoded or clean rejection

    check()


# ---------------------------------------------------------------------------
# Container probing (MP4 / MP3 / progressive JPEG)
# ---------------------------------------------------------------------------


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def _mp4_fixture(timescale=1000, duration=5400, w=640, h=360, v1=False) -> bytes:
    if v1:
        mvhd = b"\x01" + b"\x00" * 3 + b"\x00" * 16 + struct.pack(
            ">IQ", timescale, duration
        ) + b"\x00" * 80
        tkhd = b"\x01" + b"\x00" * 3 + b"\x00" * 84 + struct.pack(
            ">II", w << 16, h << 16
        )
    else:
        mvhd = b"\x00" * 12 + struct.pack(">II", timescale, duration) + b"\x00" * 80
        tkhd = b"\x00" * 76 + struct.pack(">II", w << 16, h << 16)
    moov = _box(b"moov", _box(b"mvhd", mvhd) + _box(b"trak", _box(b"tkhd", tkhd)))
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov + _box(
        b"mdat", b"\x00" * 32
    )


def _mp3_fixture(n_frames=40, bitrate_idx=9, rate_idx=0, id3=False) -> bytes:
    """Valid consecutive MPEG-1 Layer III frames (header + zero data)."""
    from rabbit_in_a_blender_spark.ext.codecs import _MP3_BITRATES, _MP3_RATES

    br = _MP3_BITRATES[bitrate_idx] * 1000
    sr = _MP3_RATES[rate_idx]
    flen = 144 * br // sr
    hdr = bytes([0xFF, 0xFB, (bitrate_idx << 4) | (rate_idx << 2), 0x00])
    body = (hdr + b"\x00" * (flen - 4)) * n_frames
    if id3:
        tag = b"TAG DATA" * 4
        body = b"ID3\x04\x00\x00" + bytes(
            [(len(tag) >> 21) & 0x7F, (len(tag) >> 14) & 0x7F,
             (len(tag) >> 7) & 0x7F, len(tag) & 0x7F]
        ) + tag + body
    return body


def test_probe_mp4_v0_and_v1():
    from rabbit_in_a_blender_spark.ext.codecs import probe_mp4

    for v1 in (False, True):
        got = probe_mp4(_mp4_fixture(timescale=600, duration=3000, w=1280,
                                     h=720, v1=v1))
        assert got == {
            "brand": "isom", "duration_ms": 5000, "width": 1280, "height": 720,
        }, (v1, got)
    assert probe_mp4(b"\x00\x00\x00\x08free") is None
    assert probe_mp4(encode_gif(_two_frames())) is None


def test_probe_mp3_with_and_without_id3():
    from rabbit_in_a_blender_spark.ext.codecs import probe_mp3

    blob = _mp3_fixture(n_frames=40, bitrate_idx=9, rate_idx=0)
    got = probe_mp3(blob)
    assert got["bitrate_kbps"] == 128 and got["sample_rate"] == 44100
    # CBR estimate: bytes*8/bitrate
    assert got["duration_ms"] == len(blob) * 8000 // 128000
    tagged = probe_mp3(_mp3_fixture(id3=True))
    assert tagged is not None and tagged["bitrate_kbps"] == 128
    assert got["duration_exact"] is False  # CBR heuristic, flagged
    # a lone sync byte is not an MP3 (needs two consecutive frames)
    assert probe_mp3(b"\xff\xfb\x90\x00" + b"\x00" * 10) is None
    assert probe_mp3(b"garbage") is None


def test_probe_mp3_xing_and_vbri_exact_duration():
    """A Xing/Info or VBRI header overrides the filesize estimate with
    the encoder-written frame count (2-3x off for VBR otherwise)."""
    import struct

    from rabbit_in_a_blender_spark.ext.codecs import probe_mp3

    def with_header(tag: bytes, n_frames: int, vbri=False) -> bytes:
        blob = bytearray(_mp3_fixture(n_frames=4))
        if vbri:
            blob[36:40] = tag
            blob[50:54] = struct.pack(">I", n_frames)
        else:
            # stereo (mode bits 00) → side info 32 bytes, Xing at 4+32
            off = 36
            blob[off : off + 4] = tag
            blob[off + 4 : off + 8] = struct.pack(">I", 1)  # frames flag
            blob[off + 8 : off + 12] = struct.pack(">I", n_frames)
        return bytes(blob)

    for tag, vbri in ((b"Xing", False), (b"Info", False), (b"VBRI", True)):
        got = probe_mp3(with_header(tag, 1000, vbri=vbri))
        assert got["duration_exact"] is True, tag
        assert got["duration_ms"] == 1000 * 1152 * 1000 // 44100, tag

    # Xing present but frames flag unset → fall back to the estimate
    blob = bytearray(_mp3_fixture(n_frames=4))
    blob[36:40] = b"Xing"
    got = probe_mp3(bytes(blob))
    assert got["duration_exact"] is False


def _prog_parity(px, sub=False, bands=((1, 63),), levels=1, quality=85):
    from rabbit_in_a_blender_spark.ext.codecs import encode_jpeg_progressive

    base = decode_jpeg(encode_jpeg(px, quality=quality, subsample=sub))
    prog = decode_jpeg(
        encode_jpeg_progressive(
            px, quality=quality, subsample=sub, bands=bands, levels=levels
        )
    )
    assert prog is not None, (sub, bands, levels)
    assert base[:2] == prog[:2]
    assert np.array_equal(base[2], prog[2]), (
        sub, bands, levels,
        int(np.abs(base[2].astype(int) - prog[2].astype(int)).max()),
    )


def test_progressive_decode_bit_identical_to_baseline():
    """Successive approximation is exact after the last refinement, so
    progressive decode of the same quantized coefficients must equal
    baseline decode bit-for-bit — any bitstream or scan-logic bug in
    either direction breaks this."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (24, 56, 3), dtype=np.uint8)
    _prog_parity(px)
    _prog_parity(px, sub=True)


def test_progressive_band_splits_and_approx_depths():
    """Spectral-selection band boundaries and multi-level refinements
    (history bits at several magnitudes) all reconstruct exactly."""
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (19, 37, 3), dtype=np.uint8)
    for bands in (((1, 63),), ((1, 5), (6, 63)), ((1, 2), (3, 9), (10, 63))):
        for levels in (1, 2, 3):
            _prog_parity(px, bands=bands, levels=levels)
            _prog_parity(px, sub=True, bands=bands, levels=levels)


def test_progressive_structured_content():
    """Gradients and solids drive long zero runs: ZRL-in-refinement,
    EOB correction-bit tails, DC-only blocks."""
    g = (np.mgrid[0:40, 0:72][0] * 3 % 256).astype(np.uint8)
    g2 = (np.mgrid[0:40, 0:72][1] * 2 % 256).astype(np.uint8)
    grad = np.stack([g, g2, ((g.astype(int) + g2) % 256).astype(np.uint8)], axis=2)
    solid = np.full((16, 24, 3), 77, np.uint8)
    for px in (grad, solid):
        _prog_parity(px, bands=((1, 5), (6, 63)), levels=2)
    # high quality → larger magnitudes → deeper correction-bit history
    _prog_parity(grad, quality=97, bands=((1, 63),), levels=2)


def test_progressive_features_through_multimodal():
    """extract_features no longer falls back to the histogram stub for
    SOF2: the decoded means must match the baseline encoding's."""
    from rabbit_in_a_blender_spark.ext.codecs import encode_jpeg_progressive
    from rabbit_in_a_blender_spark.ext.multimodal import _decode_jpeg

    px = _gradient(24, 32)
    fb = _decode_jpeg(encode_jpeg(px))
    fp = _decode_jpeg(encode_jpeg_progressive(px))
    assert fp is not None and fb == fp


def test_probe_jpeg_reads_progressive_dims():
    from rabbit_in_a_blender_spark.ext.codecs import probe_jpeg

    blob = encode_jpeg(_gradient(24, 56))
    assert probe_jpeg(blob) == {"width": 56, "height": 24, "progressive": False}
    # craft a progressive header: swap SOF0 for SOF2
    prog = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert probe_jpeg(prog) == {"width": 56, "height": 24, "progressive": True}
    # the payload is a LYING frankenstream (baseline entropy data under
    # an SOF2 header) — decode output is undefined, but must not raise
    decode_jpeg(prog)


def test_probe_media_through_spark(spark):
    from rabbit_in_a_blender_spark.ext.multimodal import MEDIA_SCHEMA, probe_media

    rows = [
        (1, "image", None, encode_jpeg(_gradient(8, 8)), None, None, None),
        (2, "video", None, _mp4_fixture(), None, None, None),
        (3, "audio", None, _mp3_fixture(), None, None, None),
        (4, "video", None, encode_gif(_two_frames()), None, None, None),
        (5, "video", None, b"\x00mystery", 99, 88, 1234),
        (6, "image", None, None, None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in probe_media(media).collect()}
    assert out[1]["format"] == "jpeg" and out[1]["width"] == 8
    assert out[2]["format"] == "mp4" and out[2]["duration_ms"] == 5400
    assert out[2]["width"] == 640 and out[2]["height"] == 360
    assert out[3]["format"] == "mp3" and out[3]["duration_ms"] > 0
    assert out[4]["format"] == "gif" and out[4]["duration_ms"] == 300
    # unknown formats keep the declared metadata
    assert out[5]["format"] == "unknown" and (out[5]["width"], out[5]["duration_ms"]) == (99, 1234)
    assert out[6]["format"] == "empty"


def test_synth_media_probe_closed_form(spark):
    """probe_media ∘ synth_media must reproduce the documented
    closed-form metadata for every id — the r7 ext_media_probe oracle
    shape, proven over the sf0.001 documents ids."""
    from rabbit_in_a_blender_spark.ext.multimodal import probe_media, synth_media

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {
        r["media_id"]: r
        for r in probe_media(synth_media(docs)).collect()
    }
    assert len(out) == docs.count()
    for i, r in out.items():
        m = i % 4
        if m == 0:
            # PNG and progressive JPEG alternate on bit 2 of the id; the
            # JPEG dims come from the real SOF2 marker walk
            assert r["format"] == ("jpeg_progressive" if (i >> 2) & 1 else "png")
            assert (r["width"], r["height"]) == (8 + i % 16, 8 + i % 8)
        elif m == 1:
            assert r["format"] == "wav"
            assert r["duration_ms"] == 100 + (i % 10) * 50
        elif m == 2:
            assert r["format"] == "mp4"
            assert r["duration_ms"] == 1000 + (i % 20) * 250
            assert (r["width"], r["height"]) == (320, 180 + (i % 4) * 60)
        else:
            assert r["format"] == "mp3"
            # CBR estimate over 417-byte frames at 128 kbps
            n = 5 + i % 15
            assert r["duration_ms"] == n * 417 * 8000 // 128000


# ---------------------------------------------------------------------------
# Spark wiring
# ---------------------------------------------------------------------------


def test_jpeg_features_through_spark(spark):
    from rabbit_in_a_blender_spark.ext.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    px = np.full((16, 16, 3), 0, np.uint8)
    px[:, :] = (200, 64, 32)
    blob = encode_jpeg(px, quality=90)
    media = spark.createDataFrame(
        [(1, "image", "image/jpeg", blob, 16, 16, None)], MEDIA_SCHEMA
    )
    (row,) = extract_features(media).collect()
    f = row["feature"]
    assert f[0] == 16.0 and f[1] == 16.0
    assert abs(f[2] - 200 / 255) < 0.01
    assert abs(f[3] - 64 / 255) < 0.01
    assert abs(f[4] - 32 / 255) < 0.01


def test_jpeg_resize_reencodes_real_jpeg(spark):
    from rabbit_in_a_blender_spark.ext.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    g = _gradient(64, 128)
    blob = encode_jpeg(g, quality=90)
    media = spark.createDataFrame(
        [(1, "image", "image/jpeg", blob, 128, 64, None)], MEDIA_SCHEMA
    )
    (row,) = resize_images(media, 32, 32).collect()
    assert (row["width"], row["height"]) == (32, 16)
    dec = decode_jpeg(bytes(row["payload"]))
    assert dec is not None, "resized payload must itself be a valid JPEG"
    w, h, out = dec
    assert (w, h) == (32, 16)
    # nearest-neighbor of a gradient stays a gradient
    assert out[0, 0, 0] < out[0, -1, 0]


def test_gif_video_features_and_frames_through_spark(spark):
    from rabbit_in_a_blender_spark.ext.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        extract_video_frames,
    )

    frames = _two_frames()
    blob = encode_gif(frames)
    media = spark.createDataFrame(
        [
            (1, "video", "image/gif", blob, 10, 8, 300),
            (2, "video", "video/mp4", b"\x00\x01\x02\x03", None, None, 2000),
        ],
        MEDIA_SCHEMA,
    )
    feats = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    # GIF: [duration_ms, n_frames, w, h, mean_gray]
    assert feats[1][:4] == [300.0, 2.0, 10.0, 8.0]
    # MP4 stays on the 8-bucket histogram stub
    assert len(feats[2]) == 8

    out = extract_video_frames(media, every_ms=100).collect()
    by_ts = {r["frame_ts_ms"]: r for r in out}
    assert set(by_ts) == {0, 100, 200}, "frame 1 visible [0,100), frame 2 [100,300)"
    assert all(r["media_id"] == 1 for r in out)
    # frame 1 is half red half blue; frames at 100/200 are frame 2
    assert abs(by_ts[0]["mean_r"] - 0.5) < 0.01
    assert abs(by_ts[100]["mean_g"] - by_ts[200]["mean_g"]) < 1e-9


def test_frame_grid_matches_frame_sample_plan(spark):
    """extract_video_frames lands on the same tick grid frame_sample_plan
    declares, so the two compose (plan for external decoders, real rows
    for GIF)."""
    from rabbit_in_a_blender_spark.ext.multimodal import (
        MEDIA_SCHEMA,
        extract_video_frames,
        frame_sample_plan,
    )

    frames = _two_frames()
    blob = encode_gif(frames)  # 300 ms total
    media = spark.createDataFrame(
        [(1, "video", "image/gif", blob, 10, 8, 300)], MEDIA_SCHEMA
    )
    plan_ts = sorted(
        r["frame_ts_ms"] for r in frame_sample_plan(media, every_ms=100).collect()
    )
    real_ts = sorted(
        r["frame_ts_ms"] for r in extract_video_frames(media, every_ms=100).collect()
    )
    assert plan_ts == real_ts == [0, 100, 200]


def test_probe_gif_matches_decode_without_decoding():
    """probe_gif reads dims/frames/duration from the block structure
    alone; its numbers must match the full decoder's on real blobs,
    and it must survive the never-raise contract on garbage."""
    from rabbit_in_a_blender_spark.ext.codecs import gif_frames, probe_gif

    blob = encode_gif(_two_frames())
    frames = gif_frames(blob)
    got = probe_gif(blob)
    assert got["n_frames"] == len(frames)
    assert got["duration_ms"] == sum(d for d, _f in frames)
    assert (got["width"], got["height"]) == (
        frames[0][1].shape[1], frames[0][1].shape[0]
    )
    assert probe_gif(b"GIF89a" + b"\x01" * 4) is None
    assert probe_gif(b"garbage") is None
    # a corrupt LZW stream still probes (no decode happens) as long as
    # the block structure is intact
    corrupt = bytearray(blob)
    i = blob.index(bytes([0x2C]))  # first image descriptor
    corrupt[i + 12] ^= 0xFF  # flip a byte inside the first data sub-block
    assert probe_gif(bytes(corrupt)) is not None


def test_progressive_parity_hypothesis():
    """Randomized parity sweep: arbitrary small images, band splits and
    refinement depths — progressive decode must equal baseline decode
    bit-for-bit on every draw (the deterministic matrix pins known
    corners; this hunts unknown ones)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rabbit_in_a_blender_spark.ext.codecs import encode_jpeg_progressive

    band_options = (
        ((1, 63),),
        ((1, 5), (6, 63)),
        ((1, 1), (2, 8), (9, 30), (31, 63)),
    )

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(8, 24),
        st.integers(8, 24),
        st.booleans(),
        st.sampled_from(band_options),
        st.integers(1, 2),
        st.integers(0, 2**32 - 1),
    )
    def check(h, w, sub, bands, levels, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(px, quality=85, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(
                px, quality=85, subsample=sub, bands=bands, levels=levels
            )
        )
        assert prog is not None
        assert np.array_equal(base[2], prog[2]), (h, w, sub, bands, levels, seed)

    check()
