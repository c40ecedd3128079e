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
    """Scale each vector to unit L2 norm (zero vectors pass unchanged).

    The norm is projected ONCE per row before the element-wise divide:
    higher-order-function lambdas are interpreted, so a transform body
    holding ``_norm(v)`` re-runs the O(d) norm fold per ELEMENT — O(d²)
    interpreted ops per row, measured at 0.65s per pass over just
    2000 x 64-dim vectors (guide §4.1: prefer built-ins, but don't nest
    an aggregate inside a per-element lambda).  CollapseProject would
    undo a naive hoist (a projected alias consumed once is always
    inlined back into its consumer), so the PLAIN norm is projected and
    the zero-guard lives in the consumer: the guard's two references to
    the non-cheap ``__l2nrm`` producer make the projection
    non-collapsible (Spark only inlines multi-referenced aliases when
    the producer expression is trivially cheap).  Same doubles, same
    results — the divide sees the identical IEEE-754 norm value.
    """
    v = F.col(vec_col).cast("array<double>")
    tmp = df.withColumn("__l2nrm", _norm(v))
    c = F.col("__l2nrm")
    safe = F.when(c == 0.0, F.lit(1.0)).otherwise(c)
    return tmp.withColumn(
        vec_col, F.transform(v, lambda x: x / safe)
    ).drop("__l2nrm")


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
    assign_method: str = "arrow",
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

    ``assign_method="arrow"`` (default since r12, VERDICT r11 task 4):
    the per-round nearest-code search rides :func:`_assign_codes_arrow`
    — the expr HOF fold is O(ksub*dsub) INTERPRETED ops per (row,
    subspace), the corpus-sized wall of this trainer exactly as the
    r10/r11 curves measured for centroid assignment; assignments are
    bit-identical (see ``_nearest_codes_np``), and the per-round
    codebook collect (m x ksub metadata) also bounds the plan lineage
    to ONE round instead of an iterations-deep lazy chain.  On this
    rung ONE collect per round serves three masters — the recomputed
    codebook frame is rebuilt as a driver-side local relation, the same
    rows feed the next round's assignment matrices, and the converted
    numpy dict rides the returned frame as the ``_collect_books_np``
    memo — so callers' encode/LUT consumers stop re-executing (or even
    re-planning, or re-collecting) the training lineage entirely.  The
    mean recomputation stays a JVM groupBy under the same ``grid``
    discipline either way.  ``"expr"`` keeps the fully-lazy
    pure-SQL-lineage trainer.
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
    if assign_method not in ("arrow", "expr"):
        raise ValueError(
            f"assign_method must be 'arrow' or 'expr', got {assign_method!r}"
        )
    mean_expr = F.avg("__val")
    if grid is not None:
        mean_expr = F.round(mean_expr, grid)
    books_np = None
    for _ in range(iterations):
        if assign_method == "arrow":
            if books_np is None:
                books_np = _collect_books_np(books)
            assigned = _assign_codes_arrow(subs, books_np, id_col)
        else:
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
        if assign_method == "arrow":
            # ONE collect serves three masters: the local-relation
            # rebuild, the next round's assignment matrices, and (after
            # the last round) every encode/LUT consumer via the
            # _collect_books_np memo.
            sel = books.select(
                F.col("sub_idx").cast("int").alias("sub_idx"),
                F.col("code").cast("int").alias("code"),
                F.col("subvec").cast("array<double>").alias("subvec"),
            )
            # ONE slice (r14, guide §5) — same rationale as
            # refine_centroids' round collapse: a |cores|-slice local
            # relation costs a |cores|-task job per JVM scan of the
            # m x ksub metadata.
            rows = sel.collect()
            spark = books.sparkSession
            books = (
                spark.createDataFrame(
                    spark.sparkContext.parallelize(rows, 1), sel.schema
                )
                if rows
                else spark.createDataFrame([], sel.schema)
            )
            books_np = _books_np_from_rows(rows)
            books._graft_books_np = books_np
    return books


def _collect_books_np(books: DataFrame) -> dict:
    """Driver-side ``{sub_idx: (codes int64 asc, codewords float64
    (ncodes x dsub))}`` of the m x ksub codebook — metadata-sized, the
    numpy twin of :func:`_books_cell`.  Codes ascend so ``argmax``'s
    first-max replicates the expr paths' min-code tie-break.

    Frames trained by :func:`train_pq_codebooks` carry the converted
    dict as a per-object memo (``_graft_books_np``): encode/LUT/search
    consumers of the SAME books frame then skip the collect job
    entirely.  The memo never outlives the frame object, so nothing is
    cached across bench or oracle invocations.
    """
    memo = getattr(books, "_graft_books_np", None)
    if memo is not None:
        return memo
    rows = books.select(
        F.col("sub_idx").cast("int").alias("sub_idx"),
        F.col("code").cast("int").alias("code"),
        F.col("subvec").cast("array<double>").alias("subvec"),
    ).collect()
    return _books_np_from_rows(rows)


def _books_np_from_rows(rows) -> dict:
    """Rows of (sub_idx, code, subvec) -> the ``_collect_books_np``
    dict, without launching a job (for callers that already hold the
    collected rows)."""
    import numpy as np

    per_sub: dict[int, list] = {}
    for r in rows:
        per_sub.setdefault(int(r["sub_idx"]), []).append(
            (int(r["code"]), np.asarray(r["subvec"], dtype=np.float64))
        )
    out = {}
    for i, entries in per_sub.items():
        entries.sort(key=lambda e: e[0])
        width = min(len(cw) for _, cw in entries)
        out[i] = (
            np.array([c for c, _ in entries], dtype=np.int64),
            np.stack([cw[:width] for _, cw in entries]),
        )
    return out


def _nearest_codes_np(vsub, codes, cwmat, round_half_up):
    """Nearest codeword per row of ``vsub`` (n x dsub) — the numpy twin
    of the expr paths' ``array_max(struct(round(-L2², 9), -code))``:
    squared-L2 accumulated LEFT-TO-RIGHT over dimensions (the
    ``aggregate`` fold's ((0+v0)+v1)+... order, so every partial is the
    same IEEE-754 double), negated and HALF_UP-rounded on the same 1e-9
    grid, then ``argmax``'s first-max over ascending codes = the
    min-code tie-break.  Assignments are therefore bit-identical to the
    expr twin (pytest-pinned)."""
    import numpy as np

    width = min(vsub.shape[1], cwmat.shape[1])
    acc = np.zeros((vsub.shape[0], cwmat.shape[0]), dtype=np.float64)
    for t in range(width):
        d = vsub[:, t, None] - cwmat[None, :, t]
        acc = acc + d * d
    rounded = round_half_up(-acc, 9)
    return codes[np.argmax(rounded, axis=1)]


def _assign_codes_arrow(subs: DataFrame, books_np: dict, id_col: str) -> DataFrame:
    """Arrow twin of :func:`_assign_codes` over (id, sub_idx, subvec)
    rows: one vectorized distance accumulation per (batch, subspace)
    instead of an interpreted O(ksub*dsub) HOF fold per row."""
    import numpy as np

    from pyspark.sql import types as T

    from ._rounding import round_half_up

    out_schema = T.StructType(
        list(subs.schema.fields) + [T.StructField("code", T.IntegerType())]
    )

    def assign(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.copy()
            code_out = np.zeros(len(pdf), dtype=np.int32)
            sub_vals = pdf["sub_idx"].to_numpy()
            for i in np.unique(sub_vals):
                sel = np.nonzero(sub_vals == i)[0]
                vsub = np.stack(
                    [
                        np.asarray(x, dtype=np.float64)
                        for x in pdf["subvec"].iloc[sel]
                    ]
                )
                codes, cwmat = books_np[int(i)]
                code_out[sel] = _nearest_codes_np(
                    vsub, codes, cwmat, round_half_up
                )
            pdf["code"] = code_out
            yield pdf

    return subs.mapInPandas(assign, schema=out_schema)


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
    method: str = "arrow",
) -> DataFrame:
    """(id, *keep, codes array<int> of length m) — one narrow projection.

    The whole codebook rides along as a broadcast 1-row attach; each
    row's m nearest-code searches happen inside a single transform, so
    encoding shuffles nothing and can run inline in a write pipeline.
    ``keep`` carries extra columns (e.g. an IVF ``centroid_id``) through
    without a post-hoc join.

    ``method="arrow"`` (default since r12, VERDICT r11 task 4): the
    expr path's nested transform is O(m*ksub*dsub) INTERPRETED lambda
    ops per corpus row — the encode, not the probe-bounded search, is
    the corpus-sized pass of an IVFADC build at 100 TB.  The Arrow twin
    does one vectorized distance accumulation per (batch, subspace)
    with codes bit-identical to the expr fold (``_nearest_codes_np``:
    same left-to-right L2 fold, 1e-9 HALF_UP grid, min-code tie-break;
    pytest-pinned and under the ext_pq/ivfpq full-replay oracles).
    ``method="expr"`` keeps the pure-SQL-lineage projection.
    """
    if method == "arrow":
        return _pq_encode_arrow(corpus, books, id_col, vec_col, m, keep)
    if method != "expr":
        raise ValueError(f"method must be 'arrow' or 'expr', got {method!r}")
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


def _pq_encode_arrow(
    corpus: DataFrame,
    books: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    keep: tuple[str, ...],
) -> DataFrame:
    """Arrow twin of the expr encode — see :func:`pq_encode`.  Subvector
    slicing replicates ``F.slice``'s ``int(i*d/m + 1)`` truncating-cast
    arithmetic so non-divisible dimensions land on the same (possibly
    ragged) boundaries as the expr/training paths."""
    import numpy as np

    from pyspark.sql import types as T

    from ._rounding import round_half_up

    books_np = _collect_books_np(books)
    src = corpus.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    out_schema = T.StructType(
        [src.schema[id_col]]
        + [src.schema[c] for c in keep]
        + [T.StructField("codes", T.ArrayType(T.IntegerType()))]
    )

    def encode(pdfs):
        import pandas as pd

        for pdf in pdfs:
            if not len(pdf):
                continue
            v = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["__v"]])
            dsub_f = v.shape[1] / m
            ln = int(dsub_f)
            mat = np.zeros((len(pdf), m), dtype=np.int32)
            for i in range(m):
                start = int(i * dsub_f + 1) - 1
                codes, cwmat = books_np[i]
                mat[:, i] = _nearest_codes_np(
                    v[:, start:start + ln], codes, cwmat, round_half_up
                )
            out = {id_col: pdf[id_col]}
            for c in keep:
                out[c] = pdf[c]
            out["codes"] = list(mat)
            yield pd.DataFrame(out)

    return src.mapInPandas(encode, schema=out_schema)


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
