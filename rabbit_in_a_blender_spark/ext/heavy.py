"""Heavy hitters at scale: Misra-Gries candidate screen + exact re-count.

The 100 TB shape for "which tokens/domains/urls appear more than n/k
times": a full groupBy over the token universe shuffles billions of
distinct keys to answer a question about dozens.  The classic two-pass
fix:

1. **Screen** (narrow, no shuffle): each partition runs a Misra-Gries
   sketch with k counters over its rows, emitting its survivors plus
   ONE sentinel row carrying the partition's row count (so the total n
   rides along instead of costing a third scan).  MG guarantees any
   item with partition frequency > n_p/k survives the partition's
   sketch; by pigeonhole an item with GLOBAL frequency > n/k must
   exceed n_p/k in at least one partition — so the union of
   per-partition survivors is a SUPERSET of the true heavy hitters
   (property-tested).  At most (k+1) × partitions rows leave the
   screen.
2. **Verify** (exact): semi-join the stream against the tiny candidate
   set (broadcast) and count exactly; keep counts > n/k.

The final output is EXACT — identical to the full groupBy — which is
what makes it oracle-checkable; only the *work* is approximate.  The
screen result is pinned (it feeds both the total and the join) and
tracked via the track_cache release contract.

Reference parity note: the reference (RiaB) has no sketch surface;
extension scope (SURVEY §2.N).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.caching import track_cache


def _mg_partition(k: int, item_col: str):
    import pandas as pd

    def run(pdfs: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict[str, int] = {}
        n_part = 0
        for pdf in pdfs:
            for item in pdf[item_col]:
                if item is None:
                    continue
                n_part += 1
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        survivors = list(counters.keys())
        yield pd.DataFrame(
            {
                item_col: survivors + [None],  # sentinel carries the count
                "n_part": [0] * len(survivors) + [n_part],
            }
        )

    return run


def _mg_screen(items: DataFrame, item_col: str, k: int) -> DataFrame:
    return items.select(
        F.col(item_col).cast("string").alias(item_col)
    ).mapInPandas(_mg_partition(k, item_col), schema=f"{item_col} string, n_part long")


def mg_candidates(items: DataFrame, item_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries survivors: ≤ k rows per partition,
    guaranteed superset of items with global frequency > n/k."""
    return (
        _mg_screen(items, item_col, k)
        .where(F.col(item_col).isNotNull())
        .select(item_col)
        .distinct()
    )


def heavy_hitters(items: DataFrame, item_col: str, k: int) -> DataFrame:
    """Items with exact global frequency > n/k, found without a
    full-universe shuffle.

    Returns ``item_col, freq`` — exactly the full groupBy's answer (MG
    screens candidates; a broadcast semi-join + count verifies).  The
    pinned screen is tracked on the result; loop callers release it
    with ``core.caching.unpersist_intermediates`` after materializing.
    """
    src = items.select(F.col(item_col).cast("string").alias(item_col)).where(
        F.col(item_col).isNotNull()
    )
    screen = _mg_screen(src, item_col, k).persist()
    n = screen.agg(F.sum("n_part")).collect()[0][0] or 0
    cand = screen.where(F.col(item_col).isNotNull()).select(item_col).distinct()
    exact = (
        src.join(F.broadcast(cand), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .where(F.col("freq") * k > F.lit(int(n)))
    )
    return track_cache(exact, [screen])
