"""As-of join — a custom operator Spark lacks natively (SURVEY §2 note:
the reference has none either; this is extension surface for time-series
/ feature-lookup workloads).

Implementation is the scalable union-merge pattern, NOT the naive
equi-join + filter + rank (which fans out |events| × |orders per key|
rows before pruning):

  1. union the left (probe) and right (reference) streams with a tag;
  2. one shuffle: window over (key) ordered by (ts, tag) carrying the
     last-seen reference payload forward (last_value ignorenulls);
  3. keep probe rows.

Cost: a single hash shuffle on the key + one sort within partitions —
the same price as one sort-merge join, independent of match fan-out.
Ties (probe.ts == ref.ts) match the reference row (tag orders ref first).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``payload`` from the latest right row
    with right_ts <= left_ts (direction='backward'; 'forward' mirrors).

    Payload columns are nullable in the output (no prior right row).
    """
    assert direction in ("backward", "forward")
    on = list(on)
    lcols = [c for c in left.columns]

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_probe"),
        *[F.col(c) for c in lcols if c not in on and c != left_ts],
        F.col(left_ts),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_probe"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on and c != left_ts],
        F.lit(None).cast(left.schema[left_ts].dataType).alias(left_ts),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").asc(), F.col("__is_probe").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = [F.last(f"__p_{c}", ignorenulls=True).over(w).alias(c) for c in payload]
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").desc(), F.col("__is_probe").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = [F.last(f"__p_{c}", ignorenulls=True).over(w).alias(c) for c in payload]

    out = unioned.select(
        *on,
        "__is_probe",
        *[c for c in lcols if c not in on],
        *carried,
    )
    return out.filter(F.col("__is_probe") == 1).drop("__is_probe")
