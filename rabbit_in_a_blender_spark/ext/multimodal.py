"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract is fully real — schemas, batch iteration,
partition sizing.  Uncompressed formats decode FOR REAL with zero extra
libraries: binary PPM (P6) images via numpy (`_decode_ppm`, plus true
nearest-neighbor resizing in `resize_images`) and PCM WAV audio via the
stdlib wave module (`_decode_wav`).  Compressed formats (JPEG/PNG/MP3/
MP4) fall back to a deterministic byte-histogram stub — swap in PIL /
torchaudio / pyav on a real cluster and nothing else changes.

Scale notes:
- binary payloads ride the columnar path (Arrow) driver-free; keep
  ``spark.sql.files.maxPartitionBytes`` sized so one partition of blobs
  fits executor memory comfortably (blobs don't split mid-row).
- feature extraction is embarrassingly parallel: mapInPandas with no
  shuffle; the output schema drops the blob unless asked to keep it, so
  downstream stages shuffle features, not pixels.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_stub(payload: bytes | None, kind: str) -> list[float]:
    """Fallback decode: 8 byte-histogram buckets as 'features'.

    Used for formats needing external codecs (JPEG/PNG/MP3/MP4 → PIL /
    torchaudio / pyav on a real cluster); uncompressed formats get REAL
    decodes below (_decode_ppm, _decode_wav) with zero extra libraries.
    """
    if payload is None:
        return [0.0] * 8
    buckets = [0] * 8
    for b in payload:
        buckets[b >> 5] += 1
    total = max(len(payload), 1)
    return [round(c / total, 6) for c in buckets]


def _decode_ppm(payload: bytes) -> list[float] | None:
    """Real image decode for binary PPM (P6): [w, h, mean_r, mean_g,
    mean_b, std_gray] — None if not a parseable P6 blob."""
    import numpy as np

    try:
        if not payload.startswith(b"P6"):
            return None
        # header: P6 <w> <h> <maxval> then one whitespace byte, then pixels
        parts, i, token = [], 2, b""
        while len(parts) < 3 and i < len(payload):
            c = payload[i : i + 1]
            if c == b"#":  # comment to end of line
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
            elif c.isspace():
                if token:
                    parts.append(int(token))
                    token = b""
            else:
                token += c
            i += 1
        w, h, maxval = parts
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
        px = px.reshape(h, w, 3).astype(np.float64) / maxval
        gray = px.mean(axis=2)
        return [
            float(w),
            float(h),
            round(float(px[:, :, 0].mean()), 6),
            round(float(px[:, :, 1].mean()), 6),
            round(float(px[:, :, 2].mean()), 6),
            round(float(gray.std()), 6),
        ]
    except Exception:
        return None


def _decode_wav(payload: bytes) -> list[float] | None:
    """Real audio decode for PCM WAV via the stdlib wave module:
    [duration_ms, n_channels, sample_rate, rms, peak] — None if not WAV."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload)) as f:
            n, rate, width = f.getnframes(), f.getframerate(), f.getsampwidth()
            raw = f.readframes(n)
            dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
            x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
            if width == 1:
                x -= 128.0
            full = float(2 ** (8 * width - 1))
            x /= full
            return [
                round(n / rate * 1000.0, 3),
                float(f.getnchannels()),
                float(rate),
                round(float(np.sqrt((x**2).mean())) if len(x) else 0.0, 6),
                round(float(np.abs(x).max()) if len(x) else 0.0, 6),
            ]
    except Exception:
        return None


def _decode(payload: bytes | None, kind: str) -> list[float]:
    """Dispatch: real decode where the format permits, histogram stub
    otherwise.  The output is variable-length by design — FEATURE_SCHEMA
    carries array<float>, and downstream consumers key on ``kind``."""
    if payload is not None:
        if kind == "image":
            real = _decode_ppm(payload)
            if real is not None:
                return real
        elif kind == "audio":
            real = _decode_wav(payload)
            if real is not None:
                return real
    return _decode_stub(payload, kind)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Binary payload → fixed-width feature vector via mapInPandas.

    One narrow pass, no shuffle; the blob column does not survive into
    the output schema.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": [
                        _decode(p, k)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    return media.mapInPandas(_batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(media: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """Image resize plumbing: cap dimensions at (max_w, max_h), preserving
    aspect ratio.  Arrow-batched mapInPandas, one narrow pass, no shuffle.

    Binary PPM (P6) payloads get a REAL nearest-neighbor resample (numpy
    index striding, re-emitted as a valid P6).  Other formats keep the
    deterministic truncation stand-in (swap in PIL on a real cluster);
    the dimension math and batch plumbing are identical either way.
    """

    def _resize_ppm(payload: bytes, nw: int, nh: int) -> bytes | None:
        import numpy as np

        meta = _decode_ppm(payload)
        if meta is None:
            return None
        w, h = int(meta[0]), int(meta[1])
        # re-locate the pixel offset the same way _decode_ppm did
        parts, i, token = [], 2, b""
        while len(parts) < 3 and i < len(payload):
            c = payload[i : i + 1]
            if c == b"#":
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
            elif c.isspace():
                if token:
                    parts.append(int(token))
                    token = b""
            else:
                token += c
            i += 1
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
        px = px.reshape(h, w, 3)
        ys = (np.arange(nh) * h // nh).clip(0, h - 1)
        xs = (np.arange(nw) * w // nw).clip(0, w - 1)
        out = px[ys][:, xs]
        return b"P6\n%d %d\n%d\n" % (nw, nh, parts[2]) + out.tobytes()

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_rows = []
            for r in pdf.itertuples(index=False):
                w, h = r.width or 0, r.height or 0
                scale = min(1.0, max_w / w if w else 1.0, max_h / h if h else 1.0)
                nw, nh = max(int(w * scale), 1) if w else w, (
                    max(int(h * scale), 1) if h else h
                )
                payload = r.payload
                if payload is not None and scale < 1.0:
                    real = (
                        _resize_ppm(payload, nw, nh)
                        if payload.startswith(b"P6")
                        else None
                    )
                    if real is not None:
                        payload = real
                    else:
                        keep = max(int(len(payload) * scale * scale), 1)
                        payload = payload[:keep]
                out_rows.append((r.media_id, r.kind, payload, nw, nh))
            yield pd.DataFrame(
                out_rows, columns=["media_id", "kind", "payload", "width", "height"]
            )

    return media.filter(media["kind"] == "image").mapInPandas(
        _batches, RESIZED_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame.

    The decode is stubbed (NotImplementedError at materialization would
    be hostile — instead the plan carries frame timestamps so the real
    decoder slots in); JVM-side sequence/explode does the fan-out, so the
    expensive part (decode) parallelizes per frame downstream.
    """
    from pyspark.sql import functions as F

    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames
