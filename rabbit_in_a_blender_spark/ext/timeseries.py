"""Hypertable-style time-series rollups over an event stream.

Continuous-aggregate shapes a telemetry/metrics pipeline needs once the
raw stream is too big to query directly:

- ``rollup_gapfill``: downsample events onto a fixed epoch-aligned
  bucket grid, then densify each group's time range (every bucket
  present, zero-count gaps materialized) and carry the last observation
  forward (LOCF) across the gaps.
- ``rolling_zscore``: flag anomalous buckets by z-scoring each bucket's
  value against the trailing window of *previous* buckets.

Scale notes (the 100 TB shape):

- Bucketing is a pure projection (``floor(epoch/width)``) — the single
  shuffle is the partial-aggregated rollup on ``(group, bucket)``.
- The spine is generated from the per-group ``(min, max)`` bucket — a
  tiny aggregate — via ``sequence`` + ``explode``: no driver collect,
  no cross join.  Spine size is |groups| x |buckets|, i.e. already
  rollup-sized, so the gap-fill join and the LOCF window both run on
  aggregated data, never on raw events.
- LOCF uses the running-count-of-non-nulls trick (``count`` over an
  ordered window defines a carry group; ``max`` within the group
  broadcasts the one non-null value) — expressible identically in any
  ANSI engine, no IGNORE NULLS dependency.
- Bucket averages are computed on an exact integer grid (values have 2
  decimals → sum of cents is an exact, order-independent integer) and
  floored onto the 1e-4 output grid, so any engine reproduces the same
  bits regardless of partial-aggregation order — ``ROUND(AVG(..))``
  lands on exact .5 ties whenever the bucket count is a power of two
  and engines split on HALF_UP-vs-binary-value semantics.

Reference parity note: the reference engine (RiaB) has no time-series
surface; this module is north-star extension scope, same tier as
`ext/dedup.py` (cited there: riab etl/*.py has no stream/rollup ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def epoch_bucket(ts: Column, width_s: int) -> Column:
    """Epoch-aligned bucket start for a timestamp column (UTC grid)."""
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(ts) / F.lit(width_s)).cast("long") * F.lit(width_s)
    )


def rollup_gapfill(
    events: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    width_s: int = 21600,
) -> DataFrame:
    """Gap-filled LOCF rollup: one row per (group, bucket) on a dense grid.

    Returns ``group_col, bucket_ts (string), n_events, avg_value_locf,
    max_value`` where ``n_events`` is 0 on gap buckets, ``max_value`` is
    NULL on gaps (raw, un-filled), and ``avg_value_locf`` carries the
    last observed (rounded) bucket average forward across gaps.
    """
    g, interval = F.col(group_col), F.expr(f"INTERVAL {width_s} SECONDS")
    roll = (
        events.select(
            g.alias("__g"),
            epoch_bucket(F.col(ts_col), width_s).alias("__bucket"),
            F.col(value_col).alias("__v"),
        )
        .groupBy("__g", "__bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("__v") * 100, 0).cast("long")).alias("__cents"),
            F.round(F.max("__v"), 4).alias("max_value"),
        )
        .withColumn(
            "__avg",
            F.floor(F.col("__cents") * 100 / F.col("n_events")) / F.lit(10000.0),
        )
        .drop("__cents")
    )
    spine = (
        roll.groupBy("__g")
        .agg(F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi"))
        .select(
            "__g",
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"), interval)).alias("__bucket"),
        )
    )
    joined = spine.join(roll, ["__g", "__bucket"], "left")
    w = Window.partitionBy("__g").orderBy("__bucket").rowsBetween(Window.unboundedPreceding, 0)
    carried = joined.withColumn("__grp", F.count("__avg").over(w))
    wg = Window.partitionBy("__g", "__grp")
    return (
        carried.withColumn("avg_value_locf", F.max("__avg").over(wg))
        .select(
            F.col("__g").alias(group_col),
            F.date_format("__bucket", TS_FMT).alias("bucket_ts"),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
            "avg_value_locf",
            "max_value",
        )
    )


def rolling_zscore(
    events: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    width_s: int = 21600,
    lookback: int = 8,
    min_prev: int = 4,
    threshold: float = 2.0,
) -> DataFrame:
    """Per-bucket anomaly z-scores against the trailing bucket window.

    Each (group, bucket) average is scored against the mean/stddev of
    the previous ``lookback`` buckets (current bucket excluded, so the
    anomaly can't suppress its own baseline).  Buckets with fewer than
    ``min_prev`` predecessors or zero variance are dropped.  The flag
    compares the *rounded* z-score so any engine reproduces it exactly.
    """
    g = F.col(group_col)
    roll = (
        events.select(
            g.alias("__g"),
            epoch_bucket(F.col(ts_col), width_s).alias("__bucket"),
            F.col(value_col).alias("__v"),
        )
        .groupBy("__g", "__bucket")
        .agg(
            F.sum(F.round(F.col("__v") * 100, 0).cast("long")).alias("__cents"),
            F.count(F.lit(1)).alias("__n"),
        )
        .select(
            "__g",
            "__bucket",
            "__n",
            ((F.col("__cents") / F.lit(100.0)) / F.col("__n")).alias("__avg"),
        )
    )
    w = Window.partitionBy("__g").orderBy("__bucket").rowsBetween(-lookback, -1)
    scored = roll.select(
        "__g",
        "__bucket",
        "__avg",
        (F.floor(F.col("__avg") * 10000) / F.lit(10000.0)).alias("__avg4"),
        F.count("__avg").over(w).alias("__n_prev"),
        F.avg("__avg").over(w).alias("__mu"),
        F.stddev_pop("__avg").over(w).alias("__sigma"),
    ).where((F.col("__n_prev") >= min_prev) & (F.col("__sigma") > 0))
    z = F.round((F.col("__avg") - F.col("__mu")) / F.col("__sigma"), 3)
    return scored.select(
        F.col("__g").alias(group_col),
        F.date_format("__bucket", TS_FMT).alias("bucket_ts"),
        F.col("__avg4").alias("avg_value"),
        z.alias("zscore"),
        (F.abs(z) > threshold).alias("is_anomaly"),
    )
