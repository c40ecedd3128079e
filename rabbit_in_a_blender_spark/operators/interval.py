"""Interval (range) join — points against time ranges without the
cross-product blowup.  Spark has no native range join (Databricks'
range-join hint is proprietary); the open-source-scale pattern is
bucketized equi-join:

  1. every interval explodes to the sequence of fixed-width time
     buckets it overlaps (explode cost = interval length / width,
     bounded and chosen by the caller);
  2. every point maps to exactly ONE bucket — so each matching
     (point, interval) pair meets in precisely one bucket and the
     join needs no post-dedup;
  3. the equi-join runs on (keys..., bucket) — an ordinary hash
     shuffle Catalyst/AQE can plan, size, and skew-split — and the
     exact ``start <= ts <= end`` predicate filters inside the join.

Versus the naive key-only join + filter, the bucket key cuts the
matched row stream from |points per key| x |intervals per key| to
near-output size.  Bucket width is the knob: narrower = more interval
replication, wider = more in-bucket filtering; pick roughly the median
interval length.

Second-granularity bucketing is sound for timestamp data: bucket ids
come from unix-seconds (floor), which is monotone in the raw
timestamp, so a point satisfying start <= ts <= end always lands in a
bucket the interval also covers; the exact predicate then runs on the
full-precision values.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same ``on`` keys)
    whose [start, end] range contains the point's timestamp.

    Output: all point columns + all interval columns except the join
    keys (one row per matching pair).  ``how='inner'`` only — the
    bucketized shape can't express unmatched-left semantics without a
    second pass; anti-join the result's point ids for that.
    """
    if how != "inner":
        raise ValueError("interval_join supports how='inner' only")
    on = list(on)
    p_bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
    i_first = F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds)
    i_last = F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds)

    # Explicit aliases: both sides often derive from the SAME source
    # table (self-join lineage), where bare df[col] references tie back
    # to one origin and Spark warns about trivially-true predicates.
    pts = points.withColumn("__bucket", p_bucket).alias("__pts")
    # start > end would make sequence() run DESCENDING (it never yields
    # empty) — an inverted interval must match nothing, so drop it first.
    ivs = (
        intervals.filter(F.col(start_col) <= F.col(end_col))
        .withColumn("__bucket", F.explode(F.sequence(i_first, i_last)))
        .alias("__ivs")
    )
    p = lambda c: F.col(f"__pts.{c}")  # noqa: E731
    i = lambda c: F.col(f"__ivs.{c}")  # noqa: E731
    cond = [p(k) == i(k) for k in on]
    cond.append(p("__bucket") == i("__bucket"))
    cond.append(p(ts_col) >= i(start_col))
    cond.append(p(ts_col) <= i(end_col))
    joined = pts.join(ivs, reduce(lambda a_, b_: a_ & b_, cond), "inner")
    out_cols = [p(c) for c in points.columns] + [
        i(c) for c in intervals.columns if c not in on
    ]
    return joined.select(*out_cols)
