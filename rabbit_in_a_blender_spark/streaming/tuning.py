"""Partitioning control for stateful streaming queries.

Stateful operators (``applyInPandasWithState``, streaming aggregations)
take their shuffle partition count from ``spark.sql.shuffle.partitions``
at the FIRST micro-batch and pin it into the checkpoint for the life of
the query — and AQE never coalesces stateful exchanges, so unlike batch
plans the initial value IS the final value.  Every state partition costs
a state-store instance (checkpoint delta files + snapshot maintenance)
and a Python-worker round trip per micro-batch even when it holds zero
groups.

So when the group-key cardinality of a stateful query is known and
small — a fixed shard count, an enum-like key — partitions beyond that
cardinality are pure per-batch overhead at ANY cluster size: there are
only K groups to spread, regardless of cores.  Measured on the bench
host (sf0.1, local[32]): the 5-group z-score stream dropped 3.9 s ->
2.7 s when its state exchange went from the 32-partition batch default
to 8.

``pinned_shuffle_partitions`` scopes the setting to the start/drain of
one streaming query and restores the session default afterwards, so
batch plans (where AQE does the adapting) are untouched.  Size it to
~the group cardinality for enum-keyed streams; leave the session
default for high-cardinality keys where state genuinely spreads.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

_KEY = "spark.sql.shuffle.partitions"


@contextmanager
def pinned_shuffle_partitions(spark: SparkSession, n: int) -> Iterator[None]:
    """Pin ``spark.sql.shuffle.partitions`` to ``n`` while a stateful
    streaming query is started and drained inside the block.

    The pinned value must be active until the query's first micro-batch
    has been planned (it is recorded into the checkpoint's offset
    metadata); wrapping ``start()`` through ``awaitTermination()`` is
    the safe pattern for ``availableNow`` replays.
    """
    old = spark.conf.get(_KEY)
    spark.conf.set(_KEY, str(n))
    try:
        yield
    finally:
        spark.conf.set(_KEY, old)
