"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract is fully real — schemas, batch iteration,
partition sizing; only the codec itself is stubbed (image/audio libraries
are not in this container).  Swap ``_decode_stub`` for PIL/torchaudio
decoding on a real cluster and nothing else changes.

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
    """Deterministic fake decode: 8 byte-histogram buckets as 'features'.

    Real deployments replace this with PIL / torchaudio / pyav decode —
    the surrounding Arrow batching is identical.
    """
    if payload is None:
        return [0.0] * 8
    buckets = [0] * 8
    for b in payload:
        buckets[b >> 5] += 1
    total = max(len(payload), 1)
    return [round(c / total, 6) for c in buckets]


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
                        _decode_stub(p, k)
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

    The pixel transform is stubbed (no PIL in this container): the fake
    'resized' payload is the original truncated proportionally to the
    area ratio — deterministic, so tests can assert byte counts.  The
    dimension math and batch plumbing are the real contract.
    """

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
