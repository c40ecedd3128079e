"""Streaming window operators (SURVEY §2.M — extension surface; the
reference is batch-only, §1.4).

Each aggregation is written once and runs in BOTH modes: the batch DFs
used by the correctness oracle and Structured Streaming DataFrames from
``streaming_events_source``.  ``F.window`` / ``F.session_window`` have
identical semantics in both.

Scale: windowed streaming aggs shuffle on (window, keys); state-store
size is bounded by the watermark — always set one in production via
``windowed_stream``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_agg(
    df: DataFrame, ts_col: str, size: str, keys: Sequence[str]
) -> DataFrame:
    """Tumbling-window count+sum per key (window start formatted)."""
    return (
        df.groupBy(F.window(F.col(ts_col), size), *[F.col(k) for k in keys])
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(
            F.date_format("window.start", TS_FMT).alias("window_start"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def sliding_agg(
    df: DataFrame, ts_col: str, size: str, slide: str, keys: Sequence[str]
) -> DataFrame:
    """Sliding-window counts per key; an event lands in size/slide windows."""
    return (
        df.groupBy(F.window(F.col(ts_col), size, slide), *[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("window.start", TS_FMT).alias("window_start"),
            *keys,
            "n_events",
        )
    )


def session_agg(
    df: DataFrame, ts_col: str, gap: str, keys: Sequence[str]
) -> DataFrame:
    """Session windows (gap-based): count+sum per (keys, session)."""
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap), *[F.col(k) for k in keys]
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(
            *keys,
            F.date_format("session_window.start", TS_FMT).alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def streaming_events_source(
    spark: SparkSession, path: str, schema=None, max_files: int = 1
) -> DataFrame:
    """File-based streaming source over an events-shaped parquet dir."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def windowed_stream(
    events: DataFrame,
    ts_col: str = "ts",
    size: str = "1 hour",
    keys: Sequence[str] = ("event_type",),
    watermark: str = "2 hours",
    dedup_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Production streaming pipeline: watermark → (optional) dedup within
    watermark → tumbling aggregation.  Late rows beyond the watermark are
    dropped and state is evicted — bounded memory at any throughput."""
    out = events.withWatermark(ts_col, watermark)
    if dedup_cols:
        out = out.dropDuplicatesWithinWatermark(list(dedup_cols))
    return tumbling_agg(out, ts_col, size, list(keys))


def streaming_dedup_screen(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "24 hours",
) -> DataFrame:
    """Exact-dedup screen for a streaming document feed: content-hash
    the text, drop repeats within the watermark horizon.

    The streaming face of ext/dedup.exact_dedup_groups — a crawler's
    re-fetches and mirror copies are discarded before they reach the
    corpus sink, with state bounded by (docs per watermark window):
    dropDuplicatesWithinWatermark evicts a hash from the state store
    once the watermark passes it, so an infinite stream runs in finite
    memory (plain dropDuplicates would grow state forever).
    """
    return (
        docs.withColumn("text_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
