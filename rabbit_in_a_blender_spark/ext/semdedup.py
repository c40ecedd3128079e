"""SemDeDup: semantic deduplication inside k-means clusters.

Public recipe: Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" (arXiv 2303.09540) — cluster
the embedding space, compare pairs only WITHIN each cluster, and drop
all but one exemplar of every cosine-near group.  Complements the
surface-form dedup family (exact/minhash docs, exact/LSH passages): it
removes semantically redundant documents whose token overlap may be
near zero.

Engine policy (deterministic, oracle-replayable): a vector is a
semantic duplicate iff some SMALLER-ID member of its cluster has
rounded cosine >= tau — the min-id member of every near-dup
neighborhood survives, the same keep-first canonical rule as exact
dedup.  (The paper keeps the lowest-centroid-similarity exemplar; any
total order works — min-id keeps the run engine-reproducible.)

Scale shape (100 TB): pairwise work is per-cluster O(|cluster|^2), so
C is the knob — the paper runs ~50k clusters to keep clusters in the
low thousands.  The candidate self-join follows the two-phase
discipline of ext/similarity.py::cosine_near_dup_lsh (VERDICT r7 task
5): the centroid_id exchange carries (cluster, id) pairs only, vectors
are fetched by id for exactly the candidate pairs, and hot clusters
fall to AQE skew-join handling.  Misses across cluster boundaries are
the documented SemDeDup trade (same as the paper).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ivf import assign_top_centroids, build_ivf_index
from .similarity import _dot, _norm


def _subsplit_hot(
    ids: DataFrame,
    cluster_col: str,
    max_cluster_size: int | None,
    op_name: str,
) -> tuple[DataFrame, list[str], list[DataFrame]]:
    """Hot-cluster guard for the within-cluster candidate self-joins
    (VERDICT r9): clusters above ``max_cluster_size`` are subsplit into
    ``ceil(n / max_cluster_size)`` deterministic id-hash sub-buckets, so
    one degenerate cluster (all-near-identical corpus, bad centroid
    init) can no longer make the pair phase O(n²) regardless of C —
    the same pathological-bucket discipline as ext/dedup.py's
    ``max_bucket_size``.

    The trade (warned loud, like the LSH cap's drop): pairs straddling
    sub-buckets are not compared, so a hot cluster keeps up to
    ``nsplits`` exemplars instead of one.  Similarity-based subsplits
    can't bound the degenerate case (identical vectors all re-assign to
    one sub-centroid), so the split key is ``pmod(xxhash64(id),
    nsplits)`` — deterministic across runs, uniform in expectation.

    Returns ``(ids', join_cols, extra_tracked)``; engaging the guard
    runs one metadata-sized job (per-cluster counts, <= C rows) over a
    persisted ``ids`` — at the default ``None`` the plan is untouched
    and fully lazy.
    """
    if max_cluster_size is None:
        return ids, [cluster_col], []
    if max_cluster_size < 1:
        raise ValueError(
            f"max_cluster_size must be >= 1, got {max_cluster_size}"
        )
    ids = ids.persist()
    hot = (
        ids.groupBy(cluster_col)
        .agg(F.count(F.lit(1)).alias("__csz"))
        .filter(F.col("__csz") > max_cluster_size)
        .select(
            cluster_col,
            F.ceil(F.col("__csz") / F.lit(max_cluster_size))
            .cast("long")
            .alias("__nsplits"),
        )
    )
    n_hot = hot.count()
    if n_hot == 0:
        return ids, [cluster_col], [ids]
    warnings.warn(
        f"{op_name}: {n_hot} cluster(s) exceed max_cluster_size="
        f"{max_cluster_size}; subsplitting into id-hash sub-buckets "
        "bounds the pair phase but keeps one exemplar PER SUB-BUCKET "
        "of a hot cluster (recall trade). Raise C (re-cluster) to "
        "restore full within-cluster recall.",
        stacklevel=3,
    )
    split = (
        ids.join(F.broadcast(hot), cluster_col, "left")
        .withColumn(
            "__sub",
            F.when(
                F.col("__nsplits").isNotNull(),
                F.pmod(F.xxhash64(F.col("__id")), F.col("__nsplits")),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .drop("__nsplits")
    )
    return split, [cluster_col, "__sub"], [ids]


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.35,
    grid: int = 6,
    keep: str = "min_id",
    probe: int = 1,
    max_cluster_size: int | None = None,
    assign_method: str = "auto",
    coarse_probe: int = 4,
) -> DataFrame:
    """(id, centroid_id, is_dup) for every corpus vector.

    ``centroids`` is the (typically Lloyd-refined, grid-rounded)
    centroid frame — pair with ``ext/ivf.py::refine_centroids(grid=...)``
    so the whole pipeline replays in SQL.  ``is_dup`` is True iff an
    EARLIER member (in the keep order) of the same cluster has
    ``round(cosine, grid) >= tau``; filtering ``is_dup`` yields the
    SemDeDup-kept corpus, and the flag form keeps the removal
    accounting explicit (like remove_duplicate_passages' n_removed).

    ``keep`` picks the exemplar order within each near-dup
    neighborhood:

    - ``"min_id"`` (default): the smallest id survives — the same
      keep-first canonical rule as exact dedup;
    - ``"low_centroid"``: the member with the LOWEST rounded cosine to
      its centroid survives (id tie-break) — the paper's policy (the
      most atypical exemplar carries the most information).

    Both orders are total and grid-rounded, so either run replays in
    SQL verbatim.

    ``probe`` (default 1) assigns each vector to its ``probe`` nearest
    centroids FOR THE CANDIDATE PHASE ONLY (via
    ``ext/ivf.py::assign_top_centroids``; the reported ``centroid_id``
    stays the nearest).  probe=2 closes most cross-cluster boundary
    misses — a near-dup pair split by a cluster boundary is still
    compared when either member's second-closest centroid is the
    other's cluster — at ~probe× candidate cost.  The flagged set at
    probe=p is a superset of the flagged set at any p' < p
    (pytest-pinned containment).

    ``max_cluster_size`` engages the hot-cluster guard (see
    :func:`_subsplit_hot`): a data distribution, not a plan, is the one
    thing that can make the within-cluster pair join O(n²), and the
    guard bounds it at a warned recall trade.

    ``assign_method`` picks the nearest-centroid assignment path.  The
    default ``"auto"`` (r12, VERDICT r11 task 1) resolves by centroid
    count via ``ext/ivf.py::resolve_assign_method``: the flat
    ``"arrow"`` BLAS rung below ``AUTO_COARSE_MIN_C`` centroids, the
    two-level ``"coarse"`` rung at or above it — the r11 scale curve
    measures flat at 70x over coarse at C=8000 with IDENTICAL
    assignments at C>=2000 on clustered geometry, and the CLI derives
    C ~ N/1000, so a large corpus must not silently ride the O(N*C*d)
    flat matmul.  ``"arrow"`` is the explicit flat opt-out (see
    ``build_ivf_index``):
    identical assignments (rounded-cosine grid + min-cid tie-break,
    pytest-pinned and oracle-gated on the SAME replay as the expr
    path), measured 44×/71× faster at C=100/200 — the r10 scale curve
    showed the interpreted HOF assignment, not the pair phase,
    dominating the fixed-density (C ∝ N) regime (PLANS.md r10 notes),
    so the default a user gets must be the path that survives 100×
    (VERDICT r10 task 1).  ``"expr"`` is the opt-in pure-SQL-lineage
    twin (``ext_semantic_dedup_expr`` gates it on the same oracle).

    ``coarse_probe`` bounds the coarse rung's super-cell miss rate
    (only used when the resolved method is ``coarse``); size it with
    ``ext/ivf.py::tune_coarse_probe`` on unfamiliar geometry — the CLI's
    ``--coarse-probe auto`` does exactly that.
    """
    if keep not in ("min_id", "low_centroid"):
        raise ValueError(f"keep must be min_id or low_centroid, got {keep!r}")
    assigned = (
        build_ivf_index(
            corpus, centroids, id_col=id_col, vec_col=vec_col,
            method=assign_method, coarse_probe=coarse_probe,
        )
        .select(
            F.col(id_col),
            F.col("centroid_id").cast("long").alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .persist()
    )
    # Keep-order key per member: plain id, or (rounded centroid cosine,
    # id) — computed via the broadcast centroid vectors, metadata-sized.
    if keep == "low_centroid":
        cvecs = centroids.select(
            F.col(id_col).cast("long").alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("__cv"),
        )
        keyed = assigned.join(F.broadcast(cvecs), "centroid_id").select(
            "centroid_id",
            F.struct(
                F.round(
                    _dot(F.col("__v"), F.col("__cv"))
                    / (_norm(F.col("__v")) * _norm(F.col("__cv"))),
                    grid,
                ).alias("k1"),
                F.col(id_col).cast("long").alias("k2"),
            ).alias("__key"),
            F.col(id_col).alias("__id"),
        )
    else:
        keyed = assigned.select(
            "centroid_id",
            F.struct(
                F.lit(0.0).alias("k1"),
                F.col(id_col).cast("long").alias("k2"),
            ).alias("__key"),
            F.col(id_col).alias("__id"),
        )
    # Phase 1: within-cluster candidate ids — the exchange carries
    # (cluster key, keep key, id) only, never the embedding.
    if probe <= 1:
        ids = keyed.select(
            F.col("centroid_id").alias("__ccid"), "__key", "__id"
        )
    else:
        # Top-p multi-assignment for candidates only: up to `probe`
        # (cluster, id) rows per vector; the keep key rides along from
        # the primary assignment so the exemplar order is unchanged.
        # the candidate phase rides the same assignment path as phase 1
        # so assign_method="coarse" keeps BOTH corpus-sized passes at
        # O(N·√C·d); "expr" keeps the probe replay pure-SQL
        probes = assign_top_centroids(
            corpus, centroids, id_col=id_col, vec_col=vec_col, p=probe,
            method=assign_method, coarse_probe=coarse_probe,
        ).select(
            F.col("centroid_id").alias("__ccid"),
            F.col(id_col).alias("__id"),
        )
        ids = probes.join(keyed.select("__id", "__key"), "__id")
    ids, join_cols, extra_tracked = _subsplit_hot(
        ids, "__ccid", max_cluster_size, "semantic_dedup"
    )
    cand = (
        ids.alias("l")
        .join(ids.alias("r"), join_cols)
        .filter(F.col("l.__key") < F.col("r.__key"))
        .select(
            F.col("l.__id").alias("__ida"), F.col("r.__id").alias("__idb")
        )
    )
    if probe > 1:
        # A pair sharing several of its top-p clusters arises once per
        # shared cluster; dedup before the (costlier) vector fetch.
        cand = cand.distinct()
    # Phase 2: fetch vectors for exactly the candidate pairs.
    va = assigned.select(F.col(id_col).alias("__ida"), F.col("__v").alias("__va"))
    vb = assigned.select(F.col(id_col).alias("__idb"), F.col("__v").alias("__vb"))
    cos = F.round(
        _dot(F.col("__va"), F.col("__vb"))
        / (_norm(F.col("__va")) * _norm(F.col("__vb"))),
        grid,
    )
    dups = (
        cand.join(va, "__ida")
        .join(vb, "__idb")
        .filter(cos >= F.lit(tau))
        .select(F.col("__idb").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    out = assigned.join(dups, id_col, "left").select(
        F.col(id_col),
        "centroid_id",
        F.coalesce("__dup", F.lit(False)).alias("is_dup"),
    )
    from ..core.caching import track_cache

    return track_cache(out, [assigned] + extra_tracked)


def incremental_semantic_dedup(
    new_vecs: DataFrame,
    index: DataFrame | None,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.35,
    grid: int = 6,
    max_cluster_size: int | None = None,
    assign_method: str = "auto",
    coarse_probe: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Screen a NEW batch of vectors against a persisted exemplar index
    — the continuous-crawl form of :func:`semantic_dedup`, mirroring
    ``ext/dedup.py::incremental_dedup``.

    ``index`` is the stored (id, centroid_id, vec) table of previously
    KEPT exemplars (``None`` bootstraps from this batch).  ``centroids``
    must be the SAME frozen centroids the index was built with —
    incremental runs never re-train; re-cluster periodically and
    rebuild the index when drift warrants it.

    A new vector is flagged iff (a) some stored exemplar in its cluster
    has ``round(cosine, grid) >= tau``, or (b) some smaller-id member
    of the same batch's same cluster does (the min-id intra-batch rule;
    transitive chains collapse fully only when they collide pairwise,
    same caveat as incremental_dedup).

    Returns ``(flags, kept_index_rows)``: flags = (id, centroid_id,
    is_dup) for the batch; kept_index_rows = the survivors' (id,
    centroid_id, vec) rows, ready to append to the index.  Release with
    ``unpersist_intermediates(flags, kept_index_rows)`` per increment.

    Scale: only the delta is assigned and compared; the index side is
    probed with a cluster-local join — store it bucketed/partitioned by
    centroid_id and the probe co-locates with no index-side shuffle, so
    cost per increment is O(delta x cluster density), not O(corpus)
    (``pipeline/warehouse.py::save_bucketed_index`` writes it that way
    and ``load_bucketed_index`` reads it back bucket-aware).

    ``max_cluster_size`` guards the INTRA-batch self-join like the
    batch operator (see :func:`_subsplit_hot`); the index-probe join is
    a screen against stored exemplars and stays exact.

    ``assign_method``/``coarse_probe`` mirror :func:`semantic_dedup`:
    the default ``"auto"`` rides the flat Arrow rung below
    ``AUTO_COARSE_MIN_C`` frozen centroids and the coarse
    O(delta·sqrt(C)·d) rung at/above it.
    """
    assigned = (
        build_ivf_index(
            new_vecs, centroids, id_col=id_col, vec_col=vec_col,
            method=assign_method, coarse_probe=coarse_probe,
        )
        .select(
            F.col(id_col),
            F.col("centroid_id").cast("long").alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .persist()
    )

    def _cos(a, b):
        return F.round(_dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b))), grid)

    losers = None
    if index is not None:
        idx = index.select(
            F.col("centroid_id").cast("long").alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("__xv"),
        )
        losers = (
            assigned.join(idx, "centroid_id")
            .filter(_cos("__v", "__xv") >= F.lit(tau))
            .select(id_col)
            .distinct()
        )
    # Intra-batch self-join gets the same hot-cluster guard as the
    # batch operator (the index-probe join above is delta×exemplars —
    # a screen, not a self-join — and must stay exact for correctness).
    ids = assigned.select(
        F.col("centroid_id").alias("__ccid"), F.col(id_col).alias("__id")
    )
    ids, join_cols, extra_tracked = _subsplit_hot(
        ids, "__ccid", max_cluster_size, "incremental_semantic_dedup"
    )
    va = assigned.select(F.col(id_col).alias("__ida"), F.col("__v").alias("__va"))
    vb = assigned.select(F.col(id_col).alias("__idb"), F.col("__v").alias("__vb"))
    intra = (
        ids.alias("l")
        .join(ids.alias("r"), join_cols)
        .filter(F.col("l.__id") < F.col("r.__id"))
        .select(F.col("l.__id").alias("__ida"), F.col("r.__id").alias("__idb"))
        .join(va, "__ida")
        .join(vb, "__idb")
        .filter(_cos("__va", "__vb") >= F.lit(tau))
        .select(F.col("__idb").alias(id_col))
        .distinct()
    )
    losers = intra if losers is None else losers.unionByName(intra).distinct()
    flags = assigned.join(
        losers.withColumn("__dup", F.lit(True)), id_col, "left"
    ).select(
        F.col(id_col),
        "centroid_id",
        F.coalesce("__dup", F.lit(False)).alias("is_dup"),
    )
    kept_index = assigned.join(losers, id_col, "left_anti").select(
        F.col(id_col), "centroid_id", F.col("__v").alias(vec_col)
    )
    from ..core.caching import track_cache

    return (
        track_cache(flags, [assigned] + extra_tracked),
        track_cache(kept_index, [assigned] + extra_tracked),
    )
