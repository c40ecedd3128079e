"""Product-quantization (PQ) approximate nearest-neighbor search — the
memory-compression companion to ext/ivf.py's IVF partition pruning.

A 100 TB embedding corpus cannot keep raw vectors hot: PQ splits each
d-dim vector into ``m`` subvectors, k-means-quantizes each subspace to
``ksub`` codes, and stores only the m code ids (m bytes at ksub<=256 vs
4d bytes raw — 32x smaller at d=64, m=8).  Search uses asymmetric
distance computation (ADC): the query stays exact, each subspace
contributes a looked-up ``dot(q_sub, codeword)`` and the scores sum.

Spark-first shapes:
- codebook training is Lloyd over (vec_id, sub_idx, subvec) rows —
  assignment is a broadcast of the (m x ksub)-row codebook collapsed to
  one array cell, nearest-code via per-row ``array_max`` (no corpus x
  ksub explosion), means via one (sub_idx, code, dim) groupBy whose
  width is m*ksub*dsub rows — metadata-sized regardless of corpus rows;
- encoding is a single narrow projection (broadcast codebooks, per-row
  transform over m subspaces) — zero shuffle, safe to run at write time;
- ADC search broadcasts the query-side lookup tables and scores each
  code row with ``aggregate(zip_with(...))`` JVM expressions; the only
  shuffle is the final per-query top-k of (query_id, id, score) rows.

Vectors should be L2-normalized first (``l2_normalize``) so inner
product == cosine and the ADC sum approximates cosine similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _dot, _norm


def l2_normalize(df: DataFrame, vec_col: str) -> DataFrame:
    """Scale each vector to unit L2 norm (zero vectors pass unchanged)."""
    v = F.col(vec_col).cast("array<double>")
    nrm = _norm(v)
    safe = F.when(nrm == 0.0, F.lit(1.0)).otherwise(nrm)
    return df.withColumn(vec_col, F.transform(v, lambda x: x / safe))


def _subvectors(df: DataFrame, id_col: str, vec_col: str, m: int) -> DataFrame:
    """(id, sub_idx, subvec) rows: each vector split into m equal slices."""
    v = F.col(vec_col).cast("array<double>")
    dsub = F.size(v) / m  # constant per corpus; computed row-side
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.struct(
            i.cast("int").alias("sub_idx"),
            F.slice(v, (i * dsub + 1).cast("int"), dsub.cast("int")).alias("subvec"),
        ),
    )
    return df.select(F.col(id_col), F.explode(subs).alias("__s")).select(
        id_col, F.col("__s.sub_idx").alias("sub_idx"), F.col("__s.subvec").alias("subvec")
    )


def train_pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    iterations: int = 2,
    grid: int | None = None,
) -> DataFrame:
    """Per-subspace k-means codebooks: (sub_idx, code, subvec).

    Seeding is deterministic (the ksub lowest-id vectors' subvectors),
    then ``iterations`` Lloyd rounds run over all subspaces at once —
    each round is one broadcast assignment plus one metadata-sized
    groupBy; adding subspaces does not add rounds.

    ``grid`` (decimals) rounds every recomputed mean per step, exactly
    like ``ext/ivf.py::refine_centroids(grid=...)``: with the
    assignment's own 1e-9 distance rounding that makes the whole Lloyd
    iteration engine-reproducible, so a PQ pipeline can be replayed by
    an unrolled SQL oracle (the k-means decimal-grid recipe).
    """
    subs = _subvectors(corpus, id_col, vec_col, m)
    seeds = _subvectors(
        corpus.orderBy(id_col).limit(ksub), id_col, vec_col, m
    )
    w = Window.partitionBy("sub_idx").orderBy(id_col)
    books = (
        seeds.withColumn("code", F.row_number().over(w) - 1)
        .select("sub_idx", "code", "subvec")
    )
    mean_expr = F.avg("__val")
    if grid is not None:
        mean_expr = F.round(mean_expr, grid)
    for _ in range(iterations):
        assigned = _assign_codes(subs, books)
        books = (
            assigned.select(
                "sub_idx",
                "code",
                F.posexplode("subvec").alias("__pos", "__val"),
            )
            .groupBy("sub_idx", "code", "__pos")
            .agg(mean_expr.alias("__mean"))
            .groupBy("sub_idx", "code")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__pos"), F.col("__mean")))
                    ),
                    lambda s: s["__mean"],
                ).alias("subvec")
            )
        )
    return books


def _books_cell(books: DataFrame):
    """Collapse the (m x ksub)-row codebook to ONE broadcastable row:
    an array over subspaces, each an array of (code, subvec) sorted by
    code — O(m * ksub * dsub) doubles of metadata."""
    per_sub = books.groupBy("sub_idx").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("code"), F.col("subvec")))
        ).alias("codes")
    )
    return per_sub.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("sub_idx"), F.col("codes")))
        ).alias("__books")
    )


def _assign_codes(subs: DataFrame, books: DataFrame) -> DataFrame:
    """Nearest codeword (L2) per (id, sub_idx) row — broadcast books,
    per-row array_max; no subs x ksub row explosion, no shuffle."""
    best = F.array_max(
        F.transform(
            # __books[sub_idx].codes: this row's subspace codebook
            F.element_at(F.col("__books"), F.col("sub_idx") + 1)["codes"],
            lambda c: F.struct(
                F.round(
                    -F.aggregate(
                        F.zip_with(
                            F.col("subvec"), c["subvec"], lambda x, y: (x - y) * (x - y)
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    ),
                    9,
                ).alias("neg_dist"),
                (-c["code"]).alias("neg_code"),
            ),
        )
    )
    return (
        subs.crossJoin(F.broadcast(_books_cell(books)))
        .withColumn("code", (-best["neg_code"]).cast("int"))
        .drop("__books")
    )


def pq_encode(
    corpus: DataFrame,
    books: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *keep, codes array<int> of length m) — one narrow projection.

    The whole codebook rides along as a broadcast 1-row attach; each
    row's m nearest-code searches happen inside a single transform, so
    encoding shuffles nothing and can run inline in a write pipeline.
    ``keep`` carries extra columns (e.g. an IVF ``centroid_id``) through
    without a post-hoc join.
    """
    v = F.col(vec_col).cast("array<double>")
    dsub = F.size(v) / m
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: -F.array_max(
            F.transform(
                F.element_at(F.col("__books"), i.cast("int") + 1)["codes"],
                lambda c: F.struct(
                    F.round(
                        -F.aggregate(
                            F.zip_with(
                                F.slice(v, (i * dsub + 1).cast("int"), dsub.cast("int")),
                                c["subvec"],
                                lambda x, y: (x - y) * (x - y),
                            ),
                            F.lit(0.0),
                            lambda acc, val: acc + val,
                        ),
                        9,
                    ).alias("neg_dist"),
                    (-c["code"]).alias("neg_code"),
                ),
            )
        )["neg_code"].cast("int"),
    )
    return (
        corpus.crossJoin(F.broadcast(_books_cell(books)))
        .select(F.col(id_col), *[F.col(c) for c in keep], codes.alias("codes"))
    )


def _query_luts(
    queries: DataFrame,
    books: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
) -> DataFrame:
    """(query_id, __lut): per-subspace ADC lookup tables, one row per
    query.  Each subspace LUT is a ``map<code id -> dot(q_sub, codeword)>``
    — keyed on the actual code id from the trained books, NOT position,
    because Lloyd training can drop an empty cluster and leave the code
    ids non-contiguous (e.g. [0, 2, 3]); a positional ``element_at``
    would then misattribute or overflow (ADVICE r5 high)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    dsub_q = F.size(F.col("__qv")) / m
    lut = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.map_from_entries(
            F.transform(
                F.element_at(F.col("__books"), i.cast("int") + 1)["codes"],
                lambda c: F.struct(
                    c["code"].cast("int").alias("key"),
                    _dot(
                        F.slice(
                            F.col("__qv"), (i * dsub_q + 1).cast("int"), dsub_q.cast("int")
                        ),
                        c["subvec"],
                    ).alias("value"),
                ),
            )
        ),
    )
    return q.crossJoin(F.broadcast(_books_cell(books))).select(
        "query_id", lut.alias("__lut")
    )


def _adc_score():
    """sum over subspaces of LUT[code]: a map lookup per subspace (ksub
    is tiny, the map scan is JVM-side) + one fold — O(m) per code row."""
    return F.round(
        F.aggregate(
            F.zip_with(
                F.col("codes"),
                F.col("__lut"),
                lambda code, sub_lut: F.element_at(sub_lut, code.cast("int")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        4,
    )


def pq_search(
    codes: DataFrame,
    books: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 3,
) -> DataFrame:
    """ADC top-k: approx inner product = sum_sub LUT[sub][code].

    The per-query lookup table (m x ksub dot products) is computed once
    on the broadcast query side; scoring a code row is then m array
    lookups + a sum — O(m) per row independent of dimension.  Returns
    (query_id, neighbor_id, score) with deterministic ties.
    """
    q_lut = _query_luts(queries, books, id_col=id_col, vec_col=vec_col, m=m)
    scored = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .crossJoin(F.broadcast(q_lut))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", _adc_score().alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def pq_search_rerank(
    codes: DataFrame,
    books: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 16,
    k: int = 3,
    shortlist: int = 32,
) -> DataFrame:
    """ADC shortlist -> exact cosine re-rank (the production "IVFADC+R"
    recipe): quantized scores pick ``shortlist`` candidates per query,
    then only those |Q| x shortlist rows touch raw vectors for an exact
    cosine, and the true top-k of that re-ranking is returned.

    The raw-vector join is driven by the shortlist (queries x shortlist
    rows — metadata-sized), so the full-precision corpus is probed, not
    scanned: at 100 TB the heavy pass reads m-byte codes and the exact
    pass is a point-lookup-sized join.  On the 64-dim driver fixture
    this lifts recall@3 from ~0.35 (plain ADC) to ~0.95+.
    """
    cand = pq_search(
        codes, books, queries, id_col=id_col, vec_col=vec_col, m=m, k=shortlist
    ).select("query_id", "neighbor_id")
    raw = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__nv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    exact = (
        cand.join(raw, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("__nv"), F.col("__qv"))
                / (_norm(F.col("__nv")) * _norm(F.col("__qv"))),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        exact.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
