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


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_digits: int = 4,
) -> DataFrame:
    """Arrow/BLAS variant of :func:`cosine_topk` — same output contract.

    The query matrix (top-k searches are |Q| x dim — dimension-sized, so
    collecting it to the driver is metadata, exactly like the broadcast
    in the JVM variant) is captured in the closure; each corpus
    partition streams through ``mapInPandas`` as Arrow batches, scores
    against the whole query matrix with ONE normalized matmul, and
    emits only its per-query partial top-k (argpartition, same
    (score desc, id asc) comparator as the final rank — a batch's
    global winners are necessarily inside its partial top-k, so the
    union of partials is a superset of the answer).  The final window
    then ranks partitions x k x |Q| candidate rows, not |C| x |Q|.

    Same selection semantics as cosine_topk; scores differ from the JVM
    fold only by summation-order ulps, absorbed by the shared rounding
    (equality on the driver fixtures is pytest-pinned).
    """
    import numpy as np
    import pandas as pd

    from rabbit_in_a_blender_spark.ext._rounding import round_half_up

    q_rows = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("v")
    ).collect()
    q_ids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["v"] for r in q_rows], dtype=np.float64)
    q_mat = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            ids = pdf["nid"].to_numpy(dtype=np.int64)
            c = np.array(list(pdf["v"]), dtype=np.float64)
            c = c / np.linalg.norm(c, axis=1, keepdims=True)
            sims = c @ q_mat.T  # |batch| x |Q|
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                col = sims[:, j]
                mask = ids != qid  # exclude self-matches
                cand_ids, cand = ids[mask], col[mask]
                if not len(cand):
                    continue
                # partial selection under the FINAL comparator: rank on
                # the ROUNDED score (what the final window ranks on,
                # HALF_UP like Spark F.round — np.round is half-even and
                # would order a representable .5 tie differently) and
                # keep a 2k pad so a rounding-tie cluster straddling the
                # cut can't evict a smaller-id winner
                kk = min(2 * k, len(cand))
                order = np.lexsort(
                    (cand_ids, -round_half_up(cand, round_digits))
                )[:kk]
                out_q.extend([qid] * kk)
                out_n.extend(cand_ids[order])
                out_s.extend(cand[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "__s": out_s}
            )

    cand = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("v")
    ).mapInPandas(score, schema="query_id long, neighbor_id long, __s double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        cand.select(
            "query_id", "neighbor_id", F.round("__s", round_digits).alias("cosine")
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def pair_cosine_survivors_arrow(
    pairs: DataFrame,
    va_col: str,
    vb_col: str,
    keep_cols: list[str],
    tau: float,
    grid: int,
) -> DataFrame:
    """Arrow/numpy twin of the expr pair-verify filter
    ``F.round(_dot(va, vb) / (_norm(va) * _norm(vb)), grid) >= tau`` —
    returns ``keep_cols`` of exactly the surviving rows.

    The r13 optimization-round fix for the measured wall of the
    SemDeDup family (guide §4.2): the expr verify pays O(dim)
    INTERPRETED lambda ops per candidate pair (HOF folds sit outside
    whole-stage codegen), profiled at 4-6 s single-task stages on the
    sf0.1 bench rows; this twin scores a whole Arrow batch with one
    per-dimension vectorized accumulation.

    Bit parity (the r11/r12 assignment-twin discipline): every float op
    replays the expr fold's order — dot and both norms accumulate
    LEFT-TO-RIGHT over dimensions (``((0+v0)+v1)+...``, vectorized
    across rows but sequential across t), ``sqrt``/``*``/``/`` are
    IEEE-754 correctly-rounded on both sides, and rounding is
    ``round_half_up`` (bit-exact ``F.round`` HALF_UP).  Edge semantics
    match Spark's comparison rules: a numeric-NaN cosine (zero-norm
    vector, 0/0) SURVIVES, because Spark orders NaN above every double
    so ``round(NaN) >= tau`` is true; a NULL vector or a ragged pair
    yields SQL NULL in the expr fold (zip_with pads with null) and is
    DROPPED — the per-row fallback replays exactly that.  One caveat,
    shared with every numpy twin in this package (see probe_lists):
    vectors with NULL *elements* are an expr-only contract — Arrow
    hands them to pandas as NaN, indistinguishable from a NaN element,
    so they ride the survive-as-NaN rule instead of the null-drop rule.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    from ._rounding import round_half_up

    src = pairs.select(*keep_cols, va_col, vb_col)
    out_schema = T.StructType([src.schema[c] for c in keep_cols])

    def _row_cosine(a, b):
        # per-row replay of zip_with(pad-with-null) + fold: a null
        # vector or ragged pair nulls the whole fold (→ None, dropped);
        # numeric NaN flows through (→ kept, NaN-largest like Spark)
        if a is None or b is None or len(a) != len(b):
            return None
        accd = accna = accnb = 0.0
        for x, y in zip(a, b):
            if x is None or y is None:
                return None
            accd += x * y
            accna += x * x
            accnb += y * y
        import math

        na, nb = math.sqrt(accna), math.sqrt(accnb)
        try:
            return accd / (na * nb)
        except ZeroDivisionError:  # not reachable for floats; safety
            return float("nan")

    def survive(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            dropped = None
            try:
                a = np.stack(
                    [np.asarray(x, dtype=np.float64) for x in pdf[va_col]]
                )
                b = np.stack(
                    [np.asarray(x, dtype=np.float64) for x in pdf[vb_col]]
                )
                accd = np.zeros(len(pdf), dtype=np.float64)
                accna = np.zeros(len(pdf), dtype=np.float64)
                accnb = np.zeros(len(pdf), dtype=np.float64)
                with np.errstate(invalid="ignore", divide="ignore"):
                    for t in range(a.shape[1]):
                        accd = accd + a[:, t] * b[:, t]
                        accna = accna + a[:, t] * a[:, t]
                        accnb = accnb + b[:, t] * b[:, t]
                    cos = accd / (np.sqrt(accna) * np.sqrt(accnb))
            except Exception:
                # ragged or null-vector batch: per-row null semantics
                rows = [
                    _row_cosine(x, y)
                    for x, y in zip(pdf[va_col], pdf[vb_col])
                ]
                dropped = np.array([r is None for r in rows])
                cos = np.array(
                    [np.nan if r is None else r for r in rows],
                    dtype=np.float64,
                )
            with np.errstate(invalid="ignore"):
                rounded = round_half_up(cos, grid)
                # Spark orders NaN above every double: NaN >= tau is TRUE
                mask = (rounded >= tau) | np.isnan(rounded)
            if dropped is not None:
                mask &= ~dropped
            yield pd.DataFrame({c: pdf[c][mask] for c in keep_cols})

    return src.mapInPandas(survive, schema=out_schema)


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    round_digits: int = 4,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b).

    The exact baseline is an all-pairs self-join — quadratic, so it is
    the CORRECTNESS reference only; at scale use
    :func:`cosine_near_dup_lsh`, which generates candidates from
    random-hyperplane buckets and verifies with the same exact cosine.
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("__va"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("__vb"),
    )
    cos = F.round(
        _dot(F.col("__va"), F.col("__vb"))
        / (_norm(F.col("__va")) * _norm(F.col("__vb"))),
        round_digits,
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _hyperplanes(dim: int, planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy needed)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]


def cosine_near_dup_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    dim: int = 64,
    planes: int = 12,
    bands: int = 6,
    round_digits: int = 4,
) -> DataFrame:
    """Scale path for embedding near-dup: sign-LSH bucketing + exact verify.

    Each vector gets a ``planes``-bit signature (sign of the dot product
    with fixed random hyperplanes), split into ``bands`` bands; vectors
    sharing any band bucket become candidates, then the exact cosine
    filter re-checks.  Two-phase candidate join (VERDICT r7 task 5): the
    bucket self-join shuffles only (bucket, id) — at billions of vectors
    carrying the embedding through both sides of that exchange would
    shuffle the whole matrix twice — and the vectors are joined back for
    exactly the deduplicated candidate pairs.  Recall is tunable via
    planes/bands (more bands of fewer bits → higher recall); banding is
    probabilistic, so this is the approximate variant — validated
    against the exact pairs in tests (LSH-pairs ⊆ exact-pairs), not
    against a SQL oracle.
    """
    v = F.col(vec_col).cast("array<double>")
    plane_arrays = [
        F.array(*[F.lit(w) for w in p]) for p in _hyperplanes(dim, planes)
    ]
    bits = [
        F.when(_dot(v, p) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in plane_arrays
    ]
    per_band = planes // bands
    sig = df.select(
        F.col(id_col).alias("__id"),
        v.alias("__vec"),
        *[
            F.concat(*bits[i * per_band : (i + 1) * per_band]).alias(f"__b{i}")
            for i in range(bands)
        ],
    )
    # Phase 1: candidate ids only — the self-join exchange carries
    # (bucket, id), never the embedding.
    buckets = sig.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.concat(F.lit(f"{i}:"), F.col(f"__b{i}"))
                    for i in range(bands)
                ]
            )
        ).alias("__bucket"),
    )
    cand = (
        buckets.alias("l")
        .join(buckets.alias("r"), ["__bucket"])
        .filter(F.col("l.__id") < F.col("r.__id"))
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # Phase 2: fetch vectors for exactly the candidate pairs.
    va = sig.select(F.col("__id").alias("id_a"), F.col("__vec").alias("__va"))
    vb = sig.select(F.col("__id").alias("id_b"), F.col("__vec").alias("__vb"))
    pairs = cand.join(va, "id_a").join(vb, "id_b")
    cos = F.round(
        _dot(F.col("__va"), F.col("__vb"))
        / (_norm(F.col("__va")) * _norm(F.col("__vb"))),
        round_digits,
    )
    return pairs.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
