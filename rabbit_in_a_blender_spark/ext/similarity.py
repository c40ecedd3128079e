"""Vector-similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, done entirely with
JVM-side higher-order functions (zip_with + aggregate) — no Python in
the row path.  The scale path (IVF-style partition pruning) keeps the
same output contract.

Scale notes (100 TB / billions of vectors):
- the query side is broadcast (top-k searches are dimension-sized);
- per-corpus-row work is O(dim) with no shuffle at all until the final
  per-query top-k, which shuffles only (query_id, corpus_id, score);
- the top-k is a window rn<=k — at large k replace with
  AQE-friendly groupBy(query).agg(max_by-style partial top-k);
- IVF variant: assign each corpus vector to its nearest of C coarse
  centroids at write time, store centroid_id as a partition column, and
  prune to the closest few centroids per query before scoring —
  partition pruning does the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Returns (query_id, neighbor_id, cosine) with deterministic ties
    (score desc, neighbor id asc).  Self-matches are excluded.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cvec"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qvec"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("__cvec"), F.col("__qvec"))
                / (_norm(F.col("__cvec")) * _norm(F.col("__qvec"))),
                round_digits,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
