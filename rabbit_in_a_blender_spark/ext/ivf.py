"""IVF-style approximate nearest-neighbor search (the scale path for
ext/similarity.cosine_topk).

Index build: every corpus vector is assigned to its nearest of C coarse
centroids; store ``centroid_id`` as a partition column.  Search: score
the query against the C centroids only, pick ``nprobe`` closest lists,
and run exact cosine inside those lists.

Centroid choice here is deterministic (the lowest-id vectors) so tests
are reproducible without an iterative k-means job; on a real corpus run
a few Lloyd iterations offline and pass the centroids in — the index
and search code below are unchanged.

Scale: the corpus scan prunes to nprobe/C of the data via partition
pruning on ``centroid_id`` (write the index with
``.partitionBy("centroid_id")``); queries are broadcast.  Recall/latency
trades with nprobe exactly like FAISS IVF-Flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _dot, _norm


def _cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def build_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "arrow",
) -> DataFrame:
    """Assign each corpus vector to its nearest centroid (cosine).

    Returns corpus + ``centroid_id``; persist with
    ``.write.partitionBy("centroid_id")`` so searches prune.

    Zero-shuffle assignment: the C centroids are collapsed to ONE row
    holding an array of (id, vector) structs, broadcast, and attached to
    every corpus row (a 1-row BroadcastNestedLoopJoin is a map-side
    attach).  Nearest-centroid is then a pure per-row ``array_max`` over
    ``transform(centroids, struct(cosine, -id))`` — no corpus×C row
    explosion, no exchange.  (The previous crossJoin + row_number window
    shuffled corpus×C rows: a 4000× exchange at C=4k on a 100 TB corpus.)
    Tie-break matches the old window (cosine desc, centroid_id asc) via
    the negated id inside the max struct.

    ``method="arrow"`` computes the same assignment with ONE BLAS
    matmul per Arrow batch instead of the per-row higher-order-function
    fold.  HOF lambdas sit outside whole-stage codegen, so the ``expr``
    path costs O(C·d) INTERPRETED ops per row — measured ~4.6M
    scalar-lambda-ops/s/host on the r10 SemDeDup scale curve (69s for
    50k rows × C=100 × d=64; the arrow twin: 1.6s, 44×), i.e. the
    assignment (not the pair phase) dominates once C reaches the
    hundreds.  The Arrow twin rounds through
    ``ext/_rounding.py::round_half_up`` (bit-exact F.round semantics)
    and breaks rounded-cosine ties to the smaller centroid id exactly
    like the max-struct, so both methods select identical assignments
    (pytest-pinned); scores differ pre-round only by summation-order
    ulps, the same contract as ``similarity.cosine_topk_arrow``.  The
    C×d centroid matrix rides in the task closure — dimension-sized
    metadata, like the JVM path's broadcast row.
    """
    if method == "arrow":
        return _build_ivf_index_arrow(corpus, centroids, id_col, vec_col)
    if method != "expr":
        raise ValueError(f"method must be 'expr' or 'arrow', got {method!r}")
    cents_row = centroids.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_col).cast("long").alias("cid"),
                    F.col(vec_col).cast("array<double>").alias("cv"),
                )
            )
        ).alias("__cents")
    )
    best = F.array_max(
        F.transform(
            F.col("__cents"),
            lambda s: F.struct(
                F.round(_cosine(F.col("__v"), s["cv"]), 6).alias("cos"),
                (-s["cid"]).alias("neg_cid"),
            ),
        )
    )
    return (
        corpus.withColumn("__v", F.col(vec_col).cast("array<double>"))
        .crossJoin(F.broadcast(cents_row))
        .withColumn("centroid_id", -best["neg_cid"])
        .drop("__cents", "__v")
    )


def _build_ivf_index_arrow(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Arrow/BLAS twin of the expr assignment — see build_ivf_index."""
    import numpy as np

    from pyspark.sql import types as T

    from ._rounding import round_half_up

    c_rows = centroids.select(
        F.col(id_col).cast("long").alias("cid"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).collect()
    c_rows.sort(key=lambda r: r["cid"])  # ascending cid: argmax first-hit
    cids = np.array([r["cid"] for r in c_rows], dtype=np.int64)
    cmat = np.array([r["cv"] for r in c_rows], dtype=np.float64)
    cnorm = np.linalg.norm(cmat, axis=1)

    src = corpus.withColumn(vec_col, F.col(vec_col).cast("array<double>"))
    out_schema = T.StructType(
        list(src.schema.fields) + [T.StructField("centroid_id", T.LongType())]
    )

    def assign(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            v = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            vnorm = np.linalg.norm(v, axis=1)
            sims = (v @ cmat.T) / np.outer(vnorm, cnorm)
            # the expr path compares ROUNDED cosines (grid 1e-6) and
            # breaks ties to the smaller cid; cids ascending makes
            # argmax's first-max exactly that tie-break
            rounded = round_half_up(sims, 6)
            pdf = pdf.copy()
            pdf["centroid_id"] = cids[np.argmax(rounded, axis=1)]
            yield pdf

    return src.mapInPandas(assign, schema=out_schema)


def assign_top_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    p: int = 2,
) -> DataFrame:
    """(id_col, centroid_id, centroid_rank 1..p): each corpus vector's
    ``p`` nearest centroids — the multi-assignment view of
    :func:`build_ivf_index` (rank 1 IS its assignment, same comparator:
    rounded cosine desc, centroid_id asc via the negated id in the sort
    struct).  Consumers that only need CANDIDATE coverage (SemDeDup's
    top-p probe, multi-list IVF inserts) read ranks 1..p; the reported/
    stored cluster stays rank 1.

    Zero-shuffle like build_ivf_index: one broadcast centroid-array row
    attached map-side, a per-row O(C log C) sort over the broadcast
    array, and a p-row posexplode — no corpus×C exchange.
    """
    if p < 1:
        raise ValueError(f"p must be >= 1, got {p}")
    cents_row = centroids.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_col).cast("long").alias("cid"),
                    F.col(vec_col).cast("array<double>").alias("cv"),
                )
            )
        ).alias("__cents")
    )
    ranked = F.slice(
        F.reverse(
            F.array_sort(
                F.transform(
                    F.col("__cents"),
                    lambda s: F.struct(
                        F.round(_cosine(F.col("__v"), s["cv"]), 6).alias("cos"),
                        (-s["cid"]).alias("neg_cid"),
                    ),
                )
            )
        ),
        1,
        p,
    )
    return (
        corpus.withColumn("__v", F.col(vec_col).cast("array<double>"))
        .crossJoin(F.broadcast(cents_row))
        .select(F.col(id_col), F.posexplode(ranked).alias("__r", "__s"))
        .select(
            F.col(id_col),
            (-F.col("__s.neg_cid")).alias("centroid_id"),
            (F.col("__r") + 1).cast("int").alias("centroid_rank"),
        )
    )


def probe_lists(
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
) -> DataFrame:
    """(query_id, __qv, centroid_id): the nprobe nearest centroid lists
    per query — the |Q| x C scoring is broadcast-side and tiny; the
    result is the metadata-sized probe driver for any IVF-family search
    (raw-vector ivf_search here, PQ-code ivfpq_search in ext/ivfpq.py)."""
    c = centroids.select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(_cosine(F.col("__qv"), F.col("__cv")), 6)), F.col("centroid_id")
    )
    return (
        q.crossJoin(F.broadcast(c))
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "__qv", "centroid_id")
    )


def ivf_search(
    index: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k: probe the nprobe nearest centroid lists only."""
    probes = probe_lists(
        centroids, queries, id_col=id_col, vec_col=vec_col, nprobe=nprobe
    )
    # Exact cosine inside the probed lists; centroid_id join prunes
    # partitions when the index is partitioned by it.
    cand = index.withColumnRenamed(id_col, "neighbor_id").join(
        F.broadcast(probes), "centroid_id"
    )
    scored = cand.filter(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(
            _cosine(F.col(vec_col).cast("array<double>"), F.col("__qv")), 4
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def refine_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 2,
    grid: int | None = None,
    assign_method: str = "arrow",
) -> DataFrame:
    """Lloyd (k-means) refinement of the coarse centroids, pure DataFrame.

    Each iteration: assign every vector to its nearest centroid
    (broadcast join, one shuffle for the window), then recompute each
    centroid as the element-wise mean of its members — posexplode to
    (centroid, dim, value), one groupBy, and an ordered re-assembly.
    Shuffle width is (centroid_id, dim_index, double): dimensions ×
    centroids rows, never corpus-sized payloads.

    ``grid`` (decimals) rounds every recomputed mean per step; with the
    assignment's own 1e-6 cosine rounding that makes the ENTIRE Lloyd
    iteration engine-reproducible — an unrolled SQL replay lands on
    identical centroids (the PageRank/logreg decimal-grid recipe), so
    k-means earns a hash gate instead of a recall bound.

    Returns a frame in the same (id_col, vec_col) shape as ``centroids``
    so it feeds straight back into build_ivf_index / ivf_search.
    """
    cents = centroids.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    for _ in range(iterations):
        assigned = build_ivf_index(
            corpus, cents, id_col=id_col, vec_col=vec_col, method=assign_method
        )
        dims = assigned.select(
            "centroid_id",
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("__pos", "__val"),
        )
        mean_expr = F.avg("__val")
        if grid is not None:
            mean_expr = F.round(mean_expr, grid)
        means = (
            dims.groupBy("centroid_id", "__pos")
            .agg(mean_expr.alias("__mean"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__pos"), F.col("__mean")))
                    ),
                    lambda s: s["__mean"],
                ).alias(vec_col)
            )
        )
        cents = means.select(F.col("centroid_id").alias(id_col), vec_col)
    return cents
