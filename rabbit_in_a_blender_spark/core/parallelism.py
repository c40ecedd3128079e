"""Scan-parallelism floor for compute-heavy per-row operators.

Guide §2.5 ("input skew: one huge unsplittable file ... repartition
immediately after the read"): the bench fixtures — like any
single-file, single-row-group parquet — plan as ONE scan task, so an
operator whose per-row work is heavy (gram profiling, shingle
hashing, Arrow-batched scoring) runs serially no matter how many
cores the session has.  ``fan_out_for_compute`` hash-repartitions the
frame up to the session's default parallelism, but ONLY when the
incoming plan has fewer partitions than that — at cluster scale a
real table scan already carries more splits than cores, so the guard
makes this a structural no-op there (no shuffle is ever added to a
plan that is already parallel).

The repartition key should be the operator's (near-)unique id column:
hash partitioning on a unique key spreads evenly and — unlike keyless
round-robin — adds no sort-before-repartition pass and stays
deterministic under task retry (guide §2.5 / SPARK-38388).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fan_out_for_compute(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` to the session default parallelism iff its
    current plan has fewer partitions; identity otherwise (see module
    docstring).  Pass the operator's unique id column(s) as the hash
    key; with no key a round-robin repartition is used."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n >= target:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)
