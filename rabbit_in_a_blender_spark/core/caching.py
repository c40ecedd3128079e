"""Release contract for load-bearing persists.

Several operators MUST pin an intermediate before running a second job
over it (range-partitioned frames re-sample their boundaries per
execution — without the pin, the numbering job and the caller's
materialization could see different partitionings).  In a batch job the
pin dies with the session; in a long-lived SparkSession (a notebook,
the dashboard server) repeated calls would accumulate cached RDDs
forever.

The contract: the operator records its persisted intermediates on the
RESULT frame via :func:`track_cache`; loop callers release them with
:func:`unpersist_intermediates` after materializing (collect/write).
The result frames stay valid afterwards — they just recompute if
re-used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_local(df: DataFrame) -> DataFrame:
    """Execute a METADATA-SIZED frame once and rebuild it as a
    driver-side local relation with identical rows and schema.

    For iterative trainers (Lloyd rounds in ``ext/ivf.py::
    refine_centroids`` / ``ext/pq.py::train_pq_codebooks``) the
    per-round model frame is C x d / m x ksub metadata, but leaving it
    lazy makes iteration i's plan embed iterations 1..i-1 — the
    optimizer re-plans (and every extra consumer re-EXECUTES) an
    iterations-deep corpus lineage.  Collapsing each round to a local
    relation bounds the plan to one round and makes downstream
    consumption free of recompute — the guide §5 persist/localCheckpoint
    rationale, minus the executor-memory pin (rows live on the driver,
    like the broadcast cells these models become anyway).

    Only call this on frames whose row count is bounded by model size,
    never on corpus-sized data.  The float64 round-trip through
    ``collect``/``createDataFrame`` is exact, so results are
    bit-identical to the lazy plan.

    The rebuilt relation is ONE partition (r14, guide §5): a bare
    ``createDataFrame(list)`` parallelizes into defaultParallelism
    slices, so every JVM materialization of the "local" model frame
    (a broadcast build, a scan inside a consumer plan) scheduled a
    |cores|-task job for metadata-sized rows — profiled at ~0.3 s per
    job at local[32] in the streaming DSIR sink.  One slice, one task.
    Values and row order are unchanged.
    """
    rows = df.collect()
    spark = df.sparkSession
    if not rows:
        return spark.createDataFrame([], df.schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), df.schema
    )


def track_cache(df: DataFrame, cached: list[DataFrame]) -> DataFrame:
    """Record persisted intermediates on the result frame so callers in
    a long-running loop can release them (ADVICE r5/r6: the continuous-
    crawl increment loop otherwise accumulates cache entries forever)."""
    df._graft_cached = list(getattr(df, "_graft_cached", [])) + cached
    return df


def unpersist_intermediates(*dfs: DataFrame, blocking: bool = False) -> int:
    """Release the persisted intermediates tracked on these result
    frames (see track_cache).  Call AFTER materializing the results
    (collect/write) — the frames stay valid afterwards, they just
    recompute if re-used.  Returns the number of entries released."""
    released = 0
    seen: set[int] = set()
    for df in dfs:
        for c in getattr(df, "_graft_cached", []):
            if id(c) in seen:
                continue
            seen.add(id(c))
            try:
                c.unpersist(blocking)
                released += 1
            except Exception:
                pass
        df._graft_cached = []
    return released


class CheckpointPin:
    """Release handle for a ``localCheckpoint(eager=False)``-pinned RDD.

    ``DataFrame.unpersist()`` only clears the CACHE entry; the
    checkpoint's truncated-lineage RDD stays in ``getPersistentRDDs``
    forever — the same long-session leak class as an unreleased
    persist.  The pinned RDD is reachable through the checkpointed
    frame's LogicalRDD node; this adapter exposes it through the same
    ``unpersist`` surface track_cache expects.

    Only release AFTER the checkpoint's consumers are materialized: a
    locally-checkpointed RDD cannot be recomputed once dropped.
    """

    def __init__(self, checkpointed_df: DataFrame):
        self._jrdd = checkpointed_df._jdf.queryExecution().analyzed().rdd()

    def unpersist(self, blocking: bool = False) -> None:
        self._jrdd.unpersist(blocking)
