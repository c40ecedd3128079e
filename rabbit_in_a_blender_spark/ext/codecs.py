"""Pure-stdlib/numpy image codecs: baseline JPEG and GIF.

Closes the VERDICT r5 "full multimodal codecs" residual for the two
remaining dominant web-crawl formats without adding any dependency:

- **Baseline JPEG** (SOF0, 8-bit, sequential, restart markers, 4:4:4 /
  4:2:0 / arbitrary sampling factors): marker parse, Huffman entropy
  decode, dequant + de-zigzag, batched numpy IDCT, chroma upsample,
  JFIF YCbCr→RGB.  A matching encoder (Annex K quantization + Huffman
  tables, 4:4:4) exists so tests can build fixtures and
  ``resize_images`` can re-emit true JPEG bytes.
- **Progressive JPEG** (SOF2, spectral selection + successive
  approximation per T.81 G.1.2 — the double-digit share of web-crawl
  JPEGs that previously fell to the histogram stub): coefficient
  planes accumulate across DC/AC first and refinement scans (EOBRUN,
  correction-bit crossing), one batched IDCT at EOI.  A progressive
  encoder (arbitrary band splits and approximation depths, EOB0-only
  so Annex K tables suffice) exists purely to pin the decoder:
  progressive decode must be bit-identical to baseline decode of the
  same pixels.  Arithmetic-coded and lossless JPEGs still return
  None → histogram stub, same honesty contract as before.
- **GIF87a/89a** (LZW decompress, global/local palettes, interlace,
  frame compositing, per-frame delays): gives the video path a REAL
  multi-frame format — ``gif_frames`` yields (delay_ms, HxWx3 uint8)
  per frame, and a minimal encoder (clear-code-per-literal LZW, always
  valid, fixture-sized) supports round-trip tests.

Everything is per-blob, allocation-bounded by one decoded image —
exactly what an Arrow-batched mapInPandas worker wants.  Reference
parity note: the reference has no media handling at all (it is an
OMOP ETL); this module serves the training-data extension surface
(SURVEY.md §2.N).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# JPEG: shared tables
# ---------------------------------------------------------------------------

#: decoders reject images/screens larger than this many pixels — a
#: mutated dimension field must fail fast, not drive a 67M-iteration
#: Python MCU loop or a multi-GB canvas allocation (found by the
#: hypothesis fuzz in tests/test_codecs.py)
MAX_PIXELS = 1 << 26

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU-T T.81 Annex K.1 example quantization tables (the de-facto standard).
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# Annex K.3 typical Huffman tables: (bits[1..16] counts, values).
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# 8-point DCT-II basis matrix: C[u, x] = a(u)/2 * cos((2x+1)u*pi/16).
# spatial = C.T @ coeff @ C ; coeff = C @ spatial @ C.T
_N = np.arange(8)
_DCT_C = np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16) / 2.0
_DCT_C[0, :] *= 1.0 / np.sqrt(2.0)


def _build_huffman_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length) per T.81 canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


from functools import lru_cache


@lru_cache(maxsize=64)
def _build_huffman_lut(
    bits: tuple[int, ...], values: tuple[int, ...]
) -> tuple[list[int], list[int]]:
    """16-bit peek lookup: index by the next 16 bits of the stream,
    read (value, code_length) in O(1).  Real JPEGs overwhelmingly ship
    the Annex K tables, so the cache makes the 65k-slot build a
    once-per-worker cost rather than once per blob."""
    val_lut = [0] * 65536
    len_lut = [0] * 65536
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length) or k >= len(values):
                # corrupt DHT: canonical code space overflow — without
                # this check the slice arithmetic below would multiply
                # out attacker-sized lists (same class as the LZW
                # root-size bomb)
                raise ValueError("bad huffman table")
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            val_lut[lo:hi] = [values[k]] * (hi - lo)
            len_lut[lo:hi] = [length] * (hi - lo)
            code += 1
            k += 1
        code <<= 1
    return val_lut, len_lut


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; stops (raising EOFError when the stream tries to
    CONSUME past the end) at any real marker.

    Holds a growing accumulator with ``nbits`` valid low bits, of which
    the bottom ``pad`` are synthetic 1-padding appended so ``peek16``
    can always window 16 bits near the end of the segment — peeking at
    pad is fine (Huffman codes shorter than the window resolve without
    touching it), consuming it is the EOF condition.
    """

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.pad = 0

    def _fill_byte(self) -> bool:
        """Shift in one unstuffed data byte; False at segment end."""
        d = self.data
        p = self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.pos = p + 2
            else:
                return False  # a real marker (RST/EOI/...) ends the segment
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def peek16(self) -> int:
        while self.nbits < 16:
            if not self._fill_byte():
                k = 16 - self.nbits
                self.acc = (self.acc << k) | ((1 << k) - 1)
                self.nbits = 16
                self.pad += k
                break
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def consume(self, n: int) -> None:
        if n > self.nbits - self.pad:
            raise EOFError
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits - self.pad < n:
            if not self._fill_byte():
                raise EOFError
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_restart(self) -> None:
        """Discard pad bits and consume the RSTn marker at a restart
        boundary.  Skips over unconsumed pad bytes — including a
        stuffed FF 00 produced when the 1-padding fills a byte — until
        the marker itself."""
        self.acc, self.nbits, self.pad = 0, 0, 0
        d, p = self.data, self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                p += 2
                break
            p += 1
        self.pos = p


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.read_bits(s)
    if v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v


def _huff_decode(r: _BitReader, lut: tuple[list[int], list[int]]) -> int:
    val_lut, len_lut = lut
    idx = r.peek16()
    length = len_lut[idx]
    if length == 0:
        raise ValueError("bad huffman code")
    r.consume(length)
    return val_lut[idx]


def decode_jpeg(payload: bytes):
    """JPEG → (w, h, HxWx3 uint8) or None (not a JPEG / corrupt /
    unsupported coding).  Baseline (SOF0/1) and progressive (SOF2,
    spectral selection + successive approximation per T.81 G.1.2) are
    fully decoded; lossless and arithmetic coding intentionally
    unsupported — caller falls back to the histogram stub."""
    try:
        return _decode_jpeg_inner(payload)
    except Exception:
        return None


def _next_marker(payload: bytes, pos: int) -> int:
    """Position of the next real marker's 0xFF at/after ``pos`` —
    skipping stuffed FF00 and RSTn (a truncated scan can leave the bit
    reader before a stray restart)."""
    p = pos
    while p + 1 < len(payload):
        if payload[p] == 0xFF and payload[p + 1] != 0x00 and not (
            0xD0 <= payload[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return len(payload)


def _decode_jpeg_inner(payload: bytes):
    if not payload.startswith(b"\xff\xd8"):
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None  # list of (cid, h, v, tq)
    w = h = 0
    restart_interval = 0
    progressive = False
    coef = None  # progressive: per-comp (block_rows, block_cols, 64) int32
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xD8:
            i += 2
            continue
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        seg = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.float64)
                    j += 64
                else:
                    tbl = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(np.float64)
                    j += 128
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # lossless / differential / arithmetic
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = tuple(seg[j + 1 : j + 17])
                n = sum(bits)
                vals = tuple(seg[j + 17 : j + 17 + n])
                tbl = _build_huffman_lut(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                j += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if not comps or w <= 0 or h <= 0 or w * h > MAX_PIXELS:
                return None
            ns = seg[0]
            scan = []  # (comp index, dc table, ac table)
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = next(k for k, comp in enumerate(comps) if comp[0] == cs)
                scan.append((ci, tt >> 4, tt & 0x0F))
            data_start = i + 2 + seglen
            if not progressive:
                return _decode_scan(
                    payload, data_start, w, h, comps, scan, qt, huff_dc,
                    huff_ac, restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if coef is None:
                coef = _alloc_prog_coef(w, h, comps)
            pos = _decode_prog_scan(
                payload, data_start, w, h, comps, scan, ss, se,
                ahal >> 4, ahal & 0x0F, huff_dc, huff_ac, coef,
                restart_interval,
            )
            i = _next_marker(payload, pos)
            continue
        elif marker == 0xD9:
            if progressive and coef is not None:
                return _finish_progressive(w, h, comps, coef, qt)
            return None
        i += 2 + seglen
    if progressive and coef is not None:  # EOI lost but scans decoded
        return _finish_progressive(w, h, comps, coef, qt)
    return None


def _decode_scan(payload, pos, w, h, comps, scan, qt, huff_dc, huff_ac, restart_interval):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component coefficient planes (in 8x8 block units)
    planes = []
    for _cid, ch, cv, _tq in comps:
        planes.append(
            np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
        )
    r = _BitReader(payload, pos)
    dc_pred = [0] * len(comps)
    mcu_index = 0
    blocks: list[list[tuple[int, int, int, np.ndarray]]] = [[] for _ in comps]
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                r.align_restart()
                dc_pred = [0] * len(comps)
            for ci, tdc, tac in scan:
                _cid, ch, cv, tq = comps[ci]
                for by in range(cv):
                    for bx in range(ch):
                        coeff = np.zeros(64, dtype=np.float64)
                        s = _huff_decode(r, huff_dc[tdc])
                        diff = _receive_extend(r, s)
                        dc_pred[ci] += diff
                        coeff[0] = dc_pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, huff_ac[tac])
                            rrr, ssss = rs >> 4, rs & 0x0F
                            if ssss == 0:
                                if rrr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rrr
                            if k > 63:
                                break
                            coeff[k] = _receive_extend(r, ssss)
                            k += 1
                        blocks[ci].append(
                            (mx * ch + bx, my * cv + by, tq, coeff)
                        )
            mcu_index += 1
    # dequant + de-zigzag + batched IDCT per component
    out_planes = []
    for ci, (_cid, ch, cv, _tq) in enumerate(comps):
        blist = blocks[ci]
        if not blist:
            out_planes.append(planes[ci])
            continue
        coefs = np.stack([b[3] for b in blist])  # (n, 64) zigzag order
        tqs = blist[0][2]
        deq = coefs * qt[tqs][None, :]
        mat = np.zeros((len(blist), 64))
        mat[:, ZIGZAG] = deq
        mat = mat.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _DCT_C, mat, _DCT_C) + 128.0
        plane = planes[ci]
        for n, (bxx, byy, _tq2, _c) in enumerate(blist):
            plane[byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8] = spatial[n]
        out_planes.append(plane)
    # upsample to full res and convert
    full = []
    for ci, (_cid, ch, cv, _tq) in enumerate(comps):
        p = out_planes[ci]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        px = np.repeat(y[:, :, None], 3, axis=2)
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        rch = y + 1.402 * cr
        gch = y - 0.344136 * cb - 0.714136 * cr
        bch = y + 1.772 * cb
        px = np.stack([rch, gch, bch], axis=2)
    return w, h, np.clip(np.rint(px), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2) — spectral selection + successive approximation
# per ITU T.81 G.1.2; coefficient planes accumulate across scans and the
# batched dequant/IDCT runs once at EOI.
# ---------------------------------------------------------------------------


def _alloc_prog_coef(w: int, h: int, comps) -> list[np.ndarray]:
    """Per-component zigzag coefficient stores, padded to whole MCUs
    (int32: successive approximation needs exact bitwise refinement)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return [
        np.zeros((mcuy * cv, mcux * ch, 64), dtype=np.int32)
        for _cid, ch, cv, _tq in comps
    ]


def _prog_dc(r, block, ci, dc_pred, lut, ah, al) -> None:
    if ah == 0:  # first DC scan: huffman diffs, point-transformed
        s = _huff_decode(r, lut)
        dc_pred[ci] += _receive_extend(r, s)
        block[0] = dc_pred[ci] << al
    elif r.read_bits(1):  # refinement: one raw bit per block
        block[0] |= 1 << al
    # else: refinement bit 0 — |= 0 is a no-op


def _prog_ac_first(r, block, ss, se, al, lut, eobrun) -> int:
    """First scan of an AC band: T.81 G.1.2.2 with EOBRUN (end-of-band
    runs span blocks).  Returns the remaining eobrun."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(r, lut)
        rr, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rr != 15:  # EOBn: run of 2^rr (+ appended bits) blocks
                eobrun = (1 << rr) - 1  # current block is a member
                if rr:
                    eobrun += r.read_bits(rr)
                return eobrun
            k += 16  # ZRL
            continue
        k += rr
        if k > se:
            raise ValueError("AC run past band end")
        block[k] = _receive_extend(r, s) << al
        k += 1
    return 0


def _prog_ac_refine(r, block, ss, se, al, lut, eobrun) -> int:
    """Refinement scan of an AC band: T.81 G.1.2.3.  Runs count only
    zero-history coefficients; every nonzero coefficient crossed eats a
    correction bit; newly-nonzero values are +-1<<al."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(r, lut)
            rr, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if rr != 15:
                    eobrun = 1 << rr
                    if rr:
                        eobrun += r.read_bits(rr)
                    break  # tail handled under eobrun below
                # ZRL: rr = 15 → skip 16 zero-history coefficients
            else:  # s must be 1 in a refinement scan
                val = p1 if r.read_bits(1) else m1
            while k <= se:
                if block[k] != 0:
                    if r.read_bits(1) and (block[k] & p1) == 0:
                        block[k] += p1 if block[k] >= 0 else m1
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val and k <= se:
                block[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if block[k] != 0 and r.read_bits(1) and (block[k] & p1) == 0:
                block[k] += p1 if block[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(
    payload, pos, w, h, comps, scan, ss, se, ah, al, huff_dc, huff_ac,
    coef, restart_interval,
):
    """Decode one progressive scan into the coefficient stores; returns
    the byte position where the entropy data ended."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    r = _BitReader(payload, pos)
    dc_pred = [0] * len(comps)
    eobrun = 0
    mcu_index = 0
    if ss == 0 and len(scan) > 1:  # interleaved DC scan over the MCU grid
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                    r.align_restart()
                    dc_pred = [0] * len(comps)
                for ci, tdc, _tac in scan:
                    _cid, ch, cv, _tq = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            _prog_dc(
                                r, coef[ci][my * cv + by, mx * ch + bx],
                                ci, dc_pred, huff_dc.get(tdc), ah, al,
                            )
                mcu_index += 1
    else:  # non-interleaved: one component, its REAL block grid
        ci, tdc, tac = scan[0]
        _cid, ch, cv, _tq = comps[ci]
        bw_real = (w * ch + 8 * hmax - 1) // (8 * hmax)
        bh_real = (h * cv + 8 * vmax - 1) // (8 * vmax)
        for by in range(bh_real):
            for bx in range(bw_real):
                if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                    r.align_restart()
                    dc_pred = [0] * len(comps)
                    eobrun = 0
                block = coef[ci][by, bx]
                if ss == 0:
                    _prog_dc(r, block, ci, dc_pred, huff_dc.get(tdc), ah, al)
                elif ah == 0:
                    eobrun = _prog_ac_first(
                        r, block, ss, se, al, huff_ac[tac], eobrun
                    )
                else:
                    eobrun = _prog_ac_refine(
                        r, block, ss, se, al, huff_ac[tac], eobrun
                    )
                mcu_index += 1
    return r.pos


def _finish_progressive(w, h, comps, coef, qt):
    """Accumulated coefficient stores → RGB: batched dequant + IDCT per
    component (same einsum shape as the baseline path), then upsample,
    crop, color-convert."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for ci, (_cid, ch, cv, tq) in enumerate(comps):
        grid = coef[ci]
        bh, bw_ = grid.shape[0], grid.shape[1]
        deq = grid.reshape(-1, 64).astype(np.float64) * qt[tq][None, :]
        mat = np.zeros((bh * bw_, 64))
        mat[:, ZIGZAG] = deq
        spatial = (
            np.einsum("ux,nuv,vy->nxy", _DCT_C, mat.reshape(-1, 8, 8), _DCT_C)
            + 128.0
        )
        plane = (
            spatial.reshape(bh, bw_, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw_ * 8)
        )
        if ch != hmax or cv != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
            )
        full.append(plane[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        px = np.repeat(y[:, :, None], 3, axis=2)
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        rch = y + 1.402 * cr
        gch = y - 0.344136 * cb - 0.714136 * cr
        bch = y + 1.772 * cb
        px = np.stack([rch, gch, bch], axis=2)
    return w, h, np.clip(np.rint(px), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# JPEG encoder (baseline, 4:4:4, Annex K tables)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = np.floor((tbl * s + 50) / 100)
    return np.clip(out, 1, 255)


def _magnitude(v: int) -> tuple[int, int]:
    """value → (category s, s-bit code)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    code = v if v > 0 else v + (1 << s) - 1
    return s, code


def _dct_quantize_plane(pp: np.ndarray, q_zz: np.ndarray) -> np.ndarray:
    """Padded plane → (block_rows, block_cols, 64) quantized zigzag
    coefficients, DCT'd for ALL blocks in one einsum (the per-block
    matmul loop was the encoder's hot spot)."""
    bh, bw = pp.shape[0] // 8, pp.shape[1] // 8
    blocks = (
        pp.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).astype(np.float64) - 128.0
    )
    coef = np.einsum("ux,rcxy,vy->rcuv", _DCT_C, blocks, _DCT_C)
    zz = coef.reshape(bh, bw, 64)[:, :, ZIGZAG] / q_zz
    return np.rint(zz).astype(np.int64)


def _encode_block(bw: _BitWriter, zz: np.ndarray,
                  pred: int, dct: dict, act: dict) -> int:
    """Entropy-code one pre-quantized zigzag block; returns the new DC
    predictor."""
    diff = int(zz[0]) - pred
    s, code = _magnitude(diff)
    hc, hl = dct[s]
    bw.write(hc, hl)
    if s:
        bw.write(code, s)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = (last_nz[-1] + 1) if len(last_nz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            hc, hl = act[0xF0]
            bw.write(hc, hl)
            run -= 16
        s, code = _magnitude(v)
        hc, hl = act[(run << 4) | s]
        bw.write(hc, hl)
        bw.write(code, s)
        run = 0
    if last < 63:
        hc, hl = act[0x00]  # EOB
        bw.write(hc, hl)
    return int(zz[0])


def _encode_prep(px: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front end: RGB → YCbCr planes → padded, DCT'd,
    quantized zigzag block grids with their Huffman code tables."""
    h, w = px.shape[0], px.shape[1]
    pxf = px.astype(np.float64)
    r, g, b = pxf[:, :, 0], pxf[:, :, 1], pxf[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    # zigzag-order quant tables (both the DQT payload and the divisor
    # applied to zigzagged coefficients — one representation throughout)
    qy = _quality_scale(QUANT_LUMA, quality).reshape(64)[ZIGZAG]
    qc = _quality_scale(QUANT_CHROMA, quality).reshape(64)[ZIGZAG]

    dc_l = _build_huffman_codes(*HUFF_DC_LUMA)
    ac_l = _build_huffman_codes(*HUFF_AC_LUMA)
    dc_c = _build_huffman_codes(*HUFF_DC_CHROMA)
    ac_c = _build_huffman_codes(*HUFF_AC_CHROMA)

    if subsample:
        # 4:2:0 — chroma halved by 2x2 mean; MCU = 16x16 (4 Y + Cb + Cr)
        he, we = h + (h & 1), w + (w & 1)
        cbp = np.pad(cb, ((0, he - h), (0, we - w)), mode="edge")
        crp = np.pad(cr, ((0, he - h), (0, we - w)), mode="edge")
        cb = cbp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
        cr = crp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
    comps = [(y, qy, dc_l, ac_l), (cb, qc, dc_c, ac_c), (cr, qc, dc_c, ac_c)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for (plane, q, dct, act), (sh, sv) in zip(comps, samp):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        pp = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        padded.append((_dct_quantize_plane(pp, q), sh, sv, dct, act))
    return h, w, qy, qc, samp, padded, mcux, mcuy


def encode_jpeg(
    px: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 uint8 RGB → baseline JFIF JPEG bytes (Annex K quant +
    Huffman tables; 4:4:4, or 4:2:0 when ``subsample`` — the form real
    crawled JPEGs overwhelmingly use, which exercises the decoder's MCU
    interleave + chroma upsample).  Deterministic; used by tests and
    resize_images.

    DQT payloads are stored in zigzag order per T.81 B.2.4.1, so the
    Annex K frequency weighting lands on the intended coefficients for
    any conforming decoder."""
    h, w, qy, qc, samp, padded, mcux, mcuy = _encode_prep(
        px, quality, subsample
    )
    bw = _BitWriter()
    preds = [0, 0, 0]
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_index
                and mcu_index % restart_interval == 0
            ):
                bw.flush()
                # markers are emitted raw — never byte-stuffed
                n = (mcu_index // restart_interval - 1) % 8
                bw.out.append(0xFF)
                bw.out.append(0xD0 + n)
                preds = [0, 0, 0]
            mcu_index += 1
            for ci, (zz_grid, sh, sv, dct, act) in enumerate(padded):
                for by in range(sv):
                    for bx in range(sh):
                        preds[ci] = _encode_block(
                            bw, zz_grid[my * sv + by, mx * sh + bx],
                            preds[ci], dct, act,
                        )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(tbl.astype(np.uint8).tolist()))

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    ysamp = 0x22 if subsample else 0x11
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, ysamp, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, qy)
        + dqt(1, qc)
        + sof
        + dht(0, 0, HUFF_DC_LUMA)
        + dht(1, 0, HUFF_AC_LUMA)
        + dht(0, 1, HUFF_DC_CHROMA)
        + dht(1, 1, HUFF_AC_CHROMA)
        + dri
        + sos
        + bytes(bw.out)
        + b"\xff\xd9"
    )


def _enc_prog_dc_first(bw, padded, mcux, mcuy, al) -> None:
    preds = [0] * len(padded)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (zz, sh, sv, dct, _act) in enumerate(padded):
                for by in range(sv):
                    for bx in range(sh):
                        v = int(zz[my * sv + by, mx * sh + bx, 0]) >> al
                        s, code = _magnitude(v - preds[ci])
                        preds[ci] = v
                        hc, hl = dct[s]
                        bw.write(hc, hl)
                        if s:
                            bw.write(code, s)


def _enc_prog_dc_refine(bw, padded, mcux, mcuy, al) -> None:
    for my in range(mcuy):
        for mx in range(mcux):
            for zz, sh, sv, _dct, _act in padded:
                for by in range(sv):
                    for bx in range(sh):
                        bw.write(
                            (int(zz[my * sv + by, mx * sh + bx, 0]) >> al) & 1,
                            1,
                        )


def _enc_prog_ac_first(bw, zzgrid, act, ss, se, al, bh, bwid) -> None:
    """First AC scan of the band Ss..Se: magnitudes point-transformed
    by ``al`` (truncation toward zero).  EOB runs are never accumulated
    past one block (EOB0 only) so the standard Annex K tables suffice —
    EOBn symbols (0x10..0xE0) are not in them."""
    for by in range(bh):
        for bx in range(bwid):
            blk = zzgrid[by, bx]
            run = 0
            for k in range(ss, se + 1):
                t = int(blk[k])
                a = abs(t) >> al
                if a == 0:
                    run += 1
                    continue
                while run > 15:
                    hc, hl = act[0xF0]
                    bw.write(hc, hl)
                    run -= 16
                s, code = _magnitude(a if t > 0 else -a)
                hc, hl = act[(run << 4) | s]
                bw.write(hc, hl)
                bw.write(code, s)
                run = 0
            if run:
                hc, hl = act[0x00]  # EOB0
                bw.write(hc, hl)


def _enc_prog_ac_refine(bw, zzgrid, act, ss, se, al, bh, bwid) -> None:
    """AC refinement scan (Ah=al+1, Al=al) of the band Ss..Se:
    newly-nonzero coefficients (abs>>al == 1) are coded as
    runs-of-zero-history + sign; correction bits of history-nonzero
    coefficients crossed by a symbol are appended right after it
    (T.81 G.1.2.3 / figure G.7 buffering)."""
    for by in range(bh):
        for bx in range(bwid):
            blk = zzgrid[by, bx]
            absv = {k: abs(int(blk[k])) >> al for k in range(ss, se + 1)}
            eobpos = 0
            for k in range(ss, se + 1):
                if absv[k] == 1:
                    eobpos = k
            run = 0
            pending: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k]
                if t == 0:
                    run += 1
                    continue
                # ZRLs only when they can't fold into the final EOB;
                # emitting upon REACHING any nonzero keeps every
                # buffered bit inside its symbol's 16-zero window
                while run > 15 and k <= eobpos:
                    hc, hl = act[0xF0]
                    bw.write(hc, hl)
                    run -= 16
                    for bit in pending:
                        bw.write(bit, 1)
                    pending = []
                if t > 1:  # history-nonzero: correction bit only
                    pending.append(t & 1)
                    continue
                hc, hl = act[(run << 4) | 1]
                bw.write(hc, hl)
                bw.write(1 if int(blk[k]) > 0 else 0, 1)
                for bit in pending:
                    bw.write(bit, 1)
                pending = []
                run = 0
            if run > 0 or pending:
                hc, hl = act[0x00]  # EOB0 + its buffered correction bits
                bw.write(hc, hl)
                for bit in pending:
                    bw.write(bit, 1)


def encode_jpeg_progressive(
    px: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    bands: tuple = ((1, 63),),
    levels: int = 1,
) -> bytes:
    """HxWx3 uint8 RGB → progressive (SOF2) JPEG bytes.

    Scan script exercises every progressive scan type: interleaved DC
    first scan at Al=levels then one raw-bit refinement per level,
    per-component AC first scans over each spectral band at Al=levels,
    then per-component AC refinements stepping Al down to 0.  Because
    successive approximation is exact once the last refinement lands,
    decoding this stream yields bit-identical pixels to decoding
    ``encode_jpeg(px, quality, subsample)`` — the parity property the
    tests pin (for any band split and approximation depth)."""
    h, w, qy, qc, samp, padded, mcux, mcuy = _encode_prep(
        px, quality, subsample
    )
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos(comps: list[tuple[int, int]], ss, se, ah, al) -> bytes:
        body = bytes([len(comps)])
        for cid, tables in comps:
            body += bytes([cid, tables])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qy.astype(np.uint8).tolist()))
    out += seg(0xDB, bytes([1]) + bytes(qc.astype(np.uint8).tolist()))
    ysamp = 0x22 if subsample else 0x11
    out += seg(
        0xC2,  # SOF2
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, ysamp, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += dht(0, 0, HUFF_DC_LUMA)
    out += dht(1, 0, HUFF_AC_LUMA)
    out += dht(0, 1, HUFF_DC_CHROMA)
    out += dht(1, 1, HUFF_AC_CHROMA)

    all_dc = [(1, 0x00), (2, 0x10), (3, 0x10)]
    # DC first (Al=levels), then one raw-bit refinement per level
    bw = _BitWriter()
    _enc_prog_dc_first(bw, padded, mcux, mcuy, levels)
    bw.flush()
    out += sos(all_dc, 0, 0, 0, levels) + bw.out
    for al in range(levels - 1, -1, -1):
        bw = _BitWriter()
        _enc_prog_dc_refine(bw, padded, mcux, mcuy, al)
        bw.flush()
        out += sos(all_dc, 0, 0, al + 1, al) + bw.out
    # per-component AC first scans per band (Al=levels), then
    # refinements stepping Al down to 0; non-interleaved scans cover
    # the component's REAL block grid
    grids = []
    for ci, (zz, sh, sv, _dct, act) in enumerate(padded):
        bwid = (w * sh + 8 * hmax - 1) // (8 * hmax)
        bh = (h * sv + 8 * vmax - 1) // (8 * vmax)
        tabs = 0x01 if ci else 0x00
        grids.append((ci, zz, act, bwid, bh, tabs))
    for ci, zz, act, bwid, bh, tabs in grids:
        for ss, se in bands:
            bw = _BitWriter()
            _enc_prog_ac_first(bw, zz, act, ss, se, levels, bh, bwid)
            bw.flush()
            out += sos([(ci + 1, tabs)], ss, se, 0, levels) + bw.out
    for al in range(levels - 1, -1, -1):
        for ci, zz, act, bwid, bh, tabs in grids:
            for ss, se in bands:
                bw = _BitWriter()
                _enc_prog_ac_refine(bw, zz, act, ss, se, al, bh, bwid)
                bw.flush()
                out += sos([(ci + 1, tabs)], ss, se, al + 1, al) + bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, limit: int) -> list[int]:
    """LZW decompress at most ``limit`` indices (the frame's pixel
    count).  The table stops growing at the spec's 4096-entry ceiling —
    a stream that never sends a clear code must not grow entries (and
    output) quadratically."""
    # spec bound (GIF89a appendix F): root size 2..8 — a corrupt byte
    # here would otherwise size the initial table at 1 << N for
    # arbitrary N, a multi-GB allocation before any decode error could
    # surface (found by the hypothesis fuzz as a memory-exhaustion hang)
    if not 2 <= min_code_size <= 8:
        raise ValueError("bad LZW minimum code size")
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = nbits = 0
    pos = 0
    n = len(data)
    while len(out) < limit:
        while nbits < code_size:
            if pos >= n:
                return out
            acc |= data[pos] << nbits  # GIF packs LSB-first
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]
        elif code < clear:
            entry = [code]
        else:
            raise ValueError("bad LZW code")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_frames(payload: bytes):
    """GIF87a/89a → list of (delay_ms, HxWx3 uint8 frame) or None.

    Frames are composited onto the logical-screen canvas honoring the
    GCE disposal method (keep / restore-to-background /
    restore-to-previous); transparency respects the GCE transparent
    index.  Interlaced frames are deinterlaced."""
    try:
        return _gif_frames_inner(payload)
    except Exception:
        return None


def _gif_frames_inner(payload: bytes):
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", payload[6:10])
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        return None
    flags = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    bg_rgb = (0, 0, 0)
    if gct is not None and bg_index < len(gct):
        canvas[:, :] = gct[bg_index]
        bg_rgb = gct[bg_index]
    frames: list[tuple[int, np.ndarray]] = []
    delay_ms = 0
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                size = payload[pos]
                packed = payload[pos + 1]
                delay_ms = struct.unpack("<H", payload[pos + 2 : pos + 4])[0] * 10
                transparent = payload[pos + 4] if packed & 0x01 else None
                disposal = (packed >> 2) & 0x07
                pos += size + 1
            # skip remaining sub-blocks
            while payload[pos] != 0:
                pos += payload[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, iw, ih = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
            if iw <= 0 or ih <= 0 or left + iw > w or top + ih > h:
                return None
            iflags = payload[pos + 9]
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                pos += 3 * n
            if pal is None:
                return None
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.array(_lzw_decode(min_code, bytes(data), iw * ih), dtype=np.int64)
            if len(idx) < iw * ih:
                idx = np.pad(idx, (0, iw * ih - len(idx)))
            idx = idx.reshape(ih, iw)
            if iflags & 0x40:  # interlaced
                de = np.zeros_like(idx)
                src = 0
                for start, step in _GIF_INTERLACE:
                    rows = range(start, ih, step)
                    for rr in rows:
                        de[rr] = idx[src]
                        src += 1
                idx = de
            if (len(frames) + 1) * w * h > (1 << 28):
                return None  # decoded-volume cap: composited frames are full-canvas copies
            rgb = pal[np.clip(idx, 0, len(pal) - 1)]
            before = canvas.copy() if disposal == 3 else None
            region = canvas[top : top + ih, left : left + iw]
            if transparent is not None:
                mask = (idx != transparent)[:, :, None]
                region[:] = np.where(mask, rgb, region)
            else:
                region[:] = rgb
            frames.append((delay_ms, canvas.copy()))
            # GCE disposal applies AFTER this frame is displayed:
            # 2 = restore the frame's rectangle to the background
            # color, 3 = restore the canvas as it was before drawing
            # (0/1 = leave in place, the draw-over default)
            if disposal == 2:
                region[:] = bg_rgb
            elif disposal == 3 and before is not None:
                canvas = before
            delay_ms, transparent, disposal = 0, None, 0
        else:
            return None
    return frames if frames else None


# ---------------------------------------------------------------------------
# Container probing: MP4 (ISO BMFF) and MP3 — metadata without codecs
# ---------------------------------------------------------------------------


def probe_jpeg(payload: bytes) -> dict | None:
    """Marker walk → {'width','height','progressive'} without entropy
    decode — works for progressive JPEGs too (whose full decode this
    module honestly declines)."""
    try:
        if not payload.startswith(b"\xff\xd8"):
            return None
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return {"width": w, "height": h, "progressive": marker == 0xC2}
            if marker in (0xDA, 0xD9):
                return None
            i += 2 + seglen
        return None
    except Exception:
        return None


def probe_gif(payload: bytes) -> dict | None:
    """Header/block walk → {'width', 'height', 'n_frames',
    'duration_ms'} WITHOUT LZW-decoding any frame — probing a 100 TB
    crawl must not pay the decode (``gif_frames`` exists for that).
    Per-frame delays come from the graphic-control extensions; image
    data sub-blocks are skipped by their length bytes."""
    try:
        if payload[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        w, h = struct.unpack("<HH", payload[6:10])
        if w <= 0 or h <= 0:
            return None
        flags = payload[10]
        pos = 13
        if flags & 0x80:
            pos += 3 * (2 << (flags & 0x07))
        n_frames = 0
        total_ms = 0
        delay_ms = 0
        while pos < len(payload):
            b = payload[pos]
            if b == 0x3B:
                break
            if b == 0x21:  # extension
                label = payload[pos + 1]
                pos += 2
                if label == 0xF9:
                    delay_ms = (
                        struct.unpack("<H", payload[pos + 2 : pos + 4])[0] * 10
                    )
                while payload[pos] != 0:
                    pos += payload[pos] + 1
                pos += 1
            elif b == 0x2C:  # image descriptor — skip, don't decode
                iflags = payload[pos + 9]
                pos += 10
                if iflags & 0x80:
                    pos += 3 * (2 << (iflags & 0x07))
                pos += 1  # LZW min code size
                while payload[pos] != 0:
                    pos += payload[pos] + 1
                pos += 1
                n_frames += 1
                total_ms += delay_ms  # raw sum, same as probing gif_frames
                delay_ms = 0
            else:
                return None
        if n_frames == 0:
            return None
        return {
            "width": int(w), "height": int(h),
            "n_frames": n_frames, "duration_ms": int(total_ms),
        }
    except Exception:
        return None


def probe_mp4(payload: bytes) -> dict | None:
    """ISO BMFF box walk → {'duration_ms', 'width', 'height', 'brand'}
    or None.  Frame DECODE stays honestly stubbed (no codec libs in
    this container), but the moov/mvhd timescale+duration and tkhd
    track dimensions are plain struct fields — a 100 TB crawl pipeline
    can partition/filter/sample on real video metadata without ever
    touching a decoder."""
    try:
        if len(payload) < 16 or payload[4:8] != b"ftyp":
            return None
        out: dict = {"brand": payload[8:12].decode("latin-1")}

        def walk(lo: int, hi: int, depth: int) -> None:
            pos = lo
            while pos + 8 <= hi and depth < 8:
                (size,) = struct.unpack(">I", payload[pos : pos + 4])
                btype = payload[pos + 4 : pos + 8]
                body = pos + 8
                if size == 1:  # 64-bit largesize
                    (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
                    body = pos + 16
                if size < 8 or pos + size > hi:
                    return
                if btype in (b"moov", b"trak"):
                    walk(body, pos + size, depth + 1)
                elif btype == b"mvhd" and "duration_ms" not in out:
                    ver = payload[body]
                    if ver == 1:
                        ts, dur = struct.unpack(
                            ">IQ", payload[body + 20 : body + 32]
                        )
                    else:
                        ts, dur = struct.unpack(
                            ">II", payload[body + 12 : body + 20]
                        )
                    if ts:
                        out["duration_ms"] = int(dur * 1000 // ts)
                elif btype == b"tkhd" and "width" not in out:
                    # v0: 4 ver/flags + 4+4 times + 4 id + 4 res + 4 dur
                    #     + 8 res + 2+2+2+2 + 36 matrix = 76 to width
                    # v1: the three times/duration widen to 8 bytes = 88
                    ver = payload[body]
                    off = body + (88 if ver == 1 else 76)
                    w16, h16 = struct.unpack(">II", payload[off : off + 8])
                    if w16 and h16:  # 16.16 fixed point; 0 for audio tracks
                        out["width"] = w16 >> 16
                        out["height"] = h16 >> 16
                pos += size

        walk(0, len(payload), 0)
        return out if "duration_ms" in out else None
    except Exception:
        return None


# MPEG-1 Layer III bitrate (kbps) and sample-rate tables (index 0b1111
# and 0b11 are invalid per spec)
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)


def probe_mp3(payload: bytes) -> dict | None:
    """MP3 frame-header scan → {'bitrate_kbps', 'sample_rate',
    'duration_ms', 'duration_exact'} or None.  Skips an ID3v2 tag if
    present; requires two consecutive valid MPEG-1 Layer III sync
    frames so random 0xFFE bytes don't false-positive.

    Duration: a Xing/Info or VBRI header in the first frame (what VBR
    encoders write precisely because the filesize/bitrate heuristic is
    2-3x off for them — ADVICE r6) carries the total frame count, so
    duration is exact (frames x 1152 samples / rate).  Without one, the
    standard CBR estimate is returned with ``duration_exact: False`` so
    consumers can tell the approximate field from real container
    durations."""
    try:
        pos = 0
        if payload[:3] == b"ID3":
            sz = payload[6:10]
            pos = 10 + (
                (sz[0] << 21) | (sz[1] << 14) | (sz[2] << 7) | sz[3]
            )

        def frame_at(p: int) -> tuple[int, int, int] | None:
            if p + 4 > len(payload):
                return None
            b0, b1, b2 = payload[p], payload[p + 1], payload[p + 2]
            if b0 != 0xFF or (b1 & 0xFE) != 0xFA:  # MPEG-1 Layer III
                return None
            br_idx = b2 >> 4
            sr_idx = (b2 >> 2) & 0x03
            if br_idx in (0, 15) or sr_idx == 3:
                return None
            br = _MP3_BITRATES[br_idx] * 1000
            sr = _MP3_RATES[sr_idx]
            pad = (b2 >> 1) & 0x01
            return br, sr, 144 * br // sr + pad

        f1 = frame_at(pos)
        if f1 is None:
            return None
        f2 = frame_at(pos + f1[2])
        if f2 is None:
            return None
        br, sr, _flen = f1
        # Xing/Info (after the 4-byte header + MPEG-1 side info: 17
        # bytes mono, 32 stereo) or VBRI (fixed 32-byte offset) carry
        # the total frame count — exact duration for VBR streams.
        n_frames = None
        mode = payload[pos + 3] >> 6 if pos + 3 < len(payload) else 0
        xing_off = pos + 4 + (17 if mode == 3 else 32)
        if payload[xing_off : xing_off + 4] in (b"Xing", b"Info"):
            (flags,) = struct.unpack(
                ">I", payload[xing_off + 4 : xing_off + 8]
            )
            if flags & 0x1:
                (n_frames,) = struct.unpack(
                    ">I", payload[xing_off + 8 : xing_off + 12]
                )
        elif payload[pos + 36 : pos + 40] == b"VBRI":
            (n_frames,) = struct.unpack(
                ">I", payload[pos + 50 : pos + 54]
            )
        if n_frames:
            duration_ms = n_frames * 1152 * 1000 // sr
            exact = True
        else:
            audio_bytes = len(payload) - pos
            duration_ms = int(audio_bytes * 8000 // br)
            exact = False
        return {
            "bitrate_kbps": br // 1000,
            "sample_rate": sr,
            "duration_ms": duration_ms,
            "duration_exact": exact,
        }
    except Exception:
        return None


def encode_gif(frames: list[tuple[int, np.ndarray]]) -> bytes:
    """Minimal GIF89a writer for fixtures: builds a global palette from
    the distinct colors across frames (≤256), encodes each frame with
    always-valid clear-code-per-pixel LZW (inefficient, spec-correct)."""
    h, w = frames[0][1].shape[0], frames[0][1].shape[1]
    colors: dict[tuple[int, int, int], int] = {}
    for _d, f in frames:
        for c in {tuple(int(v) for v in px) for px in f.reshape(-1, 3)}:
            if c not in colors:
                colors[c] = len(colors)
    if len(colors) > 256:
        raise ValueError("fixture encoder supports <=256 colors")
    bits = max((len(colors) - 1).bit_length(), 1)
    n = 1 << bits
    pal = np.zeros((n, 3), dtype=np.uint8)
    for c, i in colors.items():
        pal[i] = c
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])
    out += pal.tobytes()
    min_code = max(bits, 2)
    clear = 1 << min_code
    end = clear + 1
    code_size = min_code + 1
    for delay_ms, f in frames:
        out += bytes([0x21, 0xF9, 4, 0x00])
        out += struct.pack("<H", delay_ms // 10)
        out += bytes([0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
        out += bytes([min_code])
        idx = np.array([colors[tuple(int(v) for v in px)] for px in f.reshape(-1, 3)])
        acc = nbits = 0
        data = bytearray()

        def emit(code: int) -> None:
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += code_size
            while nbits >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        emit(clear)
        for v in idx:
            emit(int(v))
            emit(clear)  # keeps the decoder table pinned at its initial size
        emit(end)
        if nbits:
            data.append(acc & 0xFF)
        for j in range(0, len(data), 255):
            chunk = data[j : j + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)
