"""IVFADC: IVF coarse partition pruning composed with PQ code scanning
— the production ANN shape for a 100 TB embedding corpus (VERDICT r5
task 1; the composition FAISS calls ``IVFx,PQy``).

The two halves already exist and are individually oracle/recall-proven:
- ``ext/ivf.py`` prunes the corpus to ``nprobe`` coarse cells via a
  partition-prunable ``centroid_id`` join — but scores RAW vectors;
- ``ext/pq.py`` ADC-scans m-byte codes instead of 4d-byte vectors — but
  scans EVERY code row per query batch.

Here the index stores PQ codes per IVF cell, so search touches only the
probed cells' codes (nprobe/C of the corpus) at PQ compression (m bytes
per vector), then exact-reranks a |Q| x shortlist point-lookup against
raw vectors.  At C=4096, nprobe=8, m=16, d=64 that is a 512x scan-row
reduction times a 16x byte reduction before any raw vector is read.

Spark-first: the index build is the zero-shuffle IVF assignment with the
PQ encode fused into the SAME projection (``pq_encode(keep=...)`` — no
join between assignment and encoding); search joins the broadcast probe
list against the code table on ``centroid_id`` (partition pruning when
the index is written ``.partitionBy("centroid_id")``), ADC-scores with
the broadcast per-query LUT maps, and the only shuffles are the two
per-query top-k windows.

No reference equivalent (extension surface per BASELINE.json north
star); parity target is FAISS IVFADC semantics.  Both encodings are
supported: raw vectors (default — codebooks independent of the coarse
quantizer, as in IVFFlat+PQ setups) and classic residual encoding
(``residual=True`` + :func:`train_residual_books`).  Measured on the
driver fixture (d=64, m=16, ksub=32, nprobe=8): with Lloyd-REFINED
centroids the residual path lifts ADC shortlist-4 recall@3 from 0.43
to 0.63 (ties at shortlist-8+); with unrefined seed centroids it
HURTS (0.47 → 0.43 at shortlist-4) because residuals against a
badly-fit coarse quantizer have higher variance than the normalized
vectors themselves.  Rule: pair residual=True with refine_centroids.

OPQ-lite preprocessing (r7): for anisotropic embeddings, rotate the
corpus AND queries with ``ext/pca.py::balanced_subspace_model`` +
``transform_pca`` before build/search — orthonormal rotation preserves
cosine exactly, while eigenvalue-balanced subspaces cut PQ
quantization MSE 27% in the measured test (and the NAIVE unbalanced
PCA rotation measurably HURTS — see balanced_subspace_model's
docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ivf import build_ivf_index, probe_lists
from .pq import _adc_score, _query_luts, pq_encode
from .similarity import _dot, _norm


def _with_residuals(
    assigned: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    out_col: str = "__resid",
) -> DataFrame:
    """Attach out_col = vec - centroid[centroid_id] per assigned row.

    The centroid table collapses to one broadcast map cell (C x d
    doubles of metadata), so the residual is a pure per-row zip_with —
    no join, no shuffle.
    """
    cmap = centroids.agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col(id_col).cast("long").alias("key"),
                    F.col(vec_col).cast("array<double>").alias("value"),
                )
            )
        ).alias("__cmap")
    )
    resid = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.element_at(F.col("__cmap"), F.col("centroid_id").cast("long")),
        lambda x, c: x - c,
    )
    return (
        assigned.crossJoin(F.broadcast(cmap))
        .withColumn(out_col, resid)
        .drop("__cmap")
    )


def train_residual_books(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    iterations: int = 2,
) -> DataFrame:
    """PQ codebooks trained on RESIDUALS (vec - assigned centroid) — the
    classic IVFADC formulation (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", §IV): residuals concentrate near the
    origin with far less variance than raw vectors, so the same m x ksub
    code budget quantizes them with lower distortion."""
    from .pq import train_pq_codebooks

    assigned = build_ivf_index(corpus, centroids, id_col=id_col, vec_col=vec_col)
    resid = _with_residuals(assigned, centroids, id_col, vec_col).select(
        id_col, F.col("__resid").alias(vec_col)
    )
    return train_pq_codebooks(
        resid, id_col=id_col, vec_col=vec_col, m=m, ksub=ksub, iterations=iterations
    )


def build_ivfpq_index(
    corpus: DataFrame,
    centroids: DataFrame,
    books: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    residual: bool = False,
) -> DataFrame:
    """(id, centroid_id, codes): nearest-centroid assignment + PQ encode
    in one narrow pass — both the centroid cell and the codebooks ride
    as broadcast 1-row attaches, so the build shuffles nothing.

    ``residual=True`` encodes (vec - centroid) instead of the raw
    vector — pass books from :func:`train_residual_books` and search
    with the matching ``residual=True``; the residual subtraction is a
    broadcast-map zip_with, still zero-shuffle.

    Persist with ``.write.partitionBy("centroid_id")`` so searches prune
    to the probed cells at the parquet-scan level.
    """
    assigned = build_ivf_index(corpus, centroids, id_col=id_col, vec_col=vec_col)
    enc_col = vec_col
    if residual:
        assigned = _with_residuals(assigned, centroids, id_col, vec_col)
        enc_col = "__resid"
    return pq_encode(
        assigned, books, id_col=id_col, vec_col=enc_col, m=m, keep=("centroid_id",)
    )


def append_ivfpq_index(
    batch: DataFrame,
    centroids: DataFrame,
    books: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    residual: bool = False,
) -> None:
    """Continuous-crawl IVFADC append (VERDICT r10 task 5): encode ONLY
    the new batch against the FROZEN coarse centroids + PQ codebooks and
    append its code rows into an existing ``partitionBy("centroid_id")``
    index layout.

    Completes the incremental story alongside incremental dedup /
    SemDeDup / DSIR: previously any new batch forced a full index
    rebuild (re-encoding the entire history).  Because both models are
    frozen, encode(batch) is independent of every previously indexed
    row, so ``append(build(b1), b2)`` holds exactly the same (id,
    centroid_id, codes) set as ``build(b1 ∪ b2)`` (equality
    pytest-pinned) — and any search over the appended index returns
    identical results to a search over a full rebuild.

    O(batch) by construction: the plan reads the batch once (the same
    zero-shuffle fused assignment+encode as :func:`build_ivfpq_index` —
    centroid cell and codebooks ride as broadcast 1-row attaches), and
    ``mode("append")`` adds files under the existing ``centroid_id=``
    partition dirs without listing, reading, or rewriting historical
    files.  Partition pruning for probed searches is unaffected — new
    files land inside the same pruned directory tree.  Re-train the
    models (and rebuild once) only when drift degrades recall; that
    cadence is measured by ext/drift.py, not guessed.
    """
    rows = build_ivfpq_index(
        batch, centroids, books,
        id_col=id_col, vec_col=vec_col, m=m, residual=residual,
    )
    rows.write.mode("append").partitionBy("centroid_id").parquet(index_dir)


def overwrite_ivfpq_batch(
    batch: DataFrame,
    centroids: DataFrame,
    books: DataFrame,
    index_dir: str,
    batch_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    residual: bool = False,
) -> None:
    """Exactly-once variant of :func:`append_ivfpq_index` for
    at-least-once callers (foreachBatch): the batch's code rows land in
    their OWN partition subdir ``index_dir/batch=<id>/centroid_id=*``
    via ``mode("overwrite")`` — a replayed batch REPLACES its previous
    write instead of duplicating rows, so no ledger is needed.

    Readers use ``spark.read.parquet(index_dir)``: partition discovery
    surfaces both ``batch`` and ``centroid_id`` columns, and searches
    still prune on centroid_id (nested partition dirs prune the same).
    O(batch) like the plain append; historical batch dirs are never
    touched.
    """
    rows = build_ivfpq_index(
        batch, centroids, books,
        id_col=id_col, vec_col=vec_col, m=m, residual=residual,
    )
    rows.write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{index_dir.rstrip('/')}/batch={int(batch_id)}"
    )


def _adc_scored_arrow(
    index: DataFrame,
    probes: DataFrame,
    queries: DataFrame,
    books: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    residual: bool,
    _q_rows=None,
) -> DataFrame:
    """(query_id, neighbor_id, score): numpy ADC twin of the expr
    scoring inside :func:`ivfpq_search` — see method="arrow" there.
    ``_q_rows`` lets the caller reuse an already-collected query batch
    (ivfpq_search collects it once for the probe dispatch too — r14,
    one job instead of two per search).

    Score parity is bit-exact by construction (the r11 assignment-twin
    discipline): every float op replays the expr path's order — LUT
    entries are LEFT-TO-RIGHT folds of q_sub[t]*codeword[t] (the
    ``_dot`` aggregate's ((0+v0)+v1)+... order, vectorized across codes
    but sequential across t), the per-row ADC sum folds subspaces 0..m-1
    sequentially, subvector slicing replicates ``F.slice``'s
    ``int(i*d/m + 1)`` truncating-cast arithmetic, and rounding is
    ``round_half_up`` (bit-exact ``F.round`` HALF_UP).  IEEE-754
    binary64 add/mul are deterministic per (op, operand order), so the
    rounded scores — and therefore the shortlist and the final hash —
    match the expr twin exactly.

    Driver-side state is metadata-sized: the query batch (|Q| x d — a
    search batch is broadcast-sized by contract; the expr path already
    broadcasts its LUT build), the m x ksub codebooks, and for
    ``residual`` the C x d centroids for the exact dot(q, centroid)
    term.  The corpus-sized pass (probed cells' code rows) stays
    distributed and is scored per Arrow batch with ONE fancy-indexed
    gather + m adds instead of per-row interpreted HOF folds.
    """
    import numpy as np

    from pyspark.sql import types as T

    from ._rounding import round_half_up

    q_rows = (
        _q_rows
        if _q_rows is not None
        else queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        ).collect()
    )
    # books via the shared trainer memo (r14, §2.4): frames trained by
    # train_pq_codebooks carry their numpy dict, so scoring launches no
    # books collect job of its own.  The dict holds codewords truncated
    # to the per-subspace min width — the same truncation this scorer
    # applied to its own collect (min(len(cw)) below), so LUT values
    # are bit-identical.
    from .pq import _collect_books_np

    books_np = _collect_books_np(books)
    per_sub: dict[int, list] = {
        i: list(zip(codes.tolist(), cwmat))
        for i, (codes, cwmat) in books_np.items()
    }
    kmax = max(
        int(c) for codes, _ in books_np.values() for c in codes.tolist()
    )
    qindex = {r["query_id"]: i for i, r in enumerate(q_rows)}
    # L[q, sub, code] = dot(q_sub, codeword): NaN where no such code —
    # the expr twin's element_at returns null there and nulls the score
    lut = np.full((len(q_rows), m, kmax + 1), np.nan, dtype=np.float64)
    for qi, r in enumerate(q_rows):
        qv = np.asarray(r["qv"], dtype=np.float64)
        dsub_f = len(qv) / m
        ln = int(dsub_f)
        for i in range(m):
            start = int(i * dsub_f + 1) - 1
            qsub = qv[start:start + ln]
            entries = per_sub.get(i)
            if not entries:
                continue
            width = min(ln, min(len(cw) for _, cw in entries))
            cwmat = np.stack([cw[:width] for _, cw in entries])
            acc = np.zeros(len(entries), dtype=np.float64)
            for t in range(width):
                acc = acc + qsub[t] * cwmat[:, t]
            for (code, _), val in zip(entries, acc):
                lut[qi, i, code] = val
    qc_dot = None
    if residual:
        c_rows = centroids.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        ).collect()
        qc_dot = {}
        for qi, r in enumerate(q_rows):
            qv = np.asarray(r["qv"], dtype=np.float64)
            for cr in c_rows:
                cv = np.asarray(cr["cv"], dtype=np.float64)
                width = min(len(qv), len(cv))
                acc = 0.0
                for t in range(width):
                    acc = acc + qv[t] * cv[t]
                qc_dot[(r["query_id"], cr["cid"])] = acc

    keep = ["query_id", "neighbor_id", "codes"] + (
        ["centroid_id"] if residual else []
    )
    cand = (
        index.withColumnRenamed(id_col, "neighbor_id")
        .join(
            F.broadcast(probes.select("query_id", "centroid_id")),
            "centroid_id",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(*keep)
    )
    out_schema = T.StructType(
        [
            cand.schema["query_id"],
            cand.schema["neighbor_id"],
            T.StructField("score", T.DoubleType()),
        ]
    )
    sub_idx = np.arange(m)

    def score(pdfs):
        import pandas as pd

        for pdf in pdfs:
            if not len(pdf):
                continue
            qi = pdf["query_id"].map(qindex).to_numpy(dtype=np.int64)
            codes = np.stack(
                [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
            )
            # element_at semantics for ANY unknown code: out-of-range
            # ids must behave like in-range-but-absent ones (NaN -> the
            # NULL below), not crash the gather
            bad = (codes < 0) | (codes > kmax)
            vals = lut[qi[:, None], sub_idx[None, :], np.where(bad, 0, codes)]
            vals[bad] = np.nan
            acc = np.zeros(len(pdf), dtype=np.float64)
            for i in range(m):
                acc = acc + vals[:, i]
            s = round_half_up(acc, 4)
            if residual:
                qc = np.array(
                    [
                        qc_dot[(q, c)]
                        for q, c in zip(pdf["query_id"], pdf["centroid_id"])
                    ],
                    dtype=np.float64,
                )
                s = round_half_up(qc + s, 4)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    # NaN (a code absent from the codebook) → NULL, to
                    # match the expr twin's element_at: Spark orders
                    # NaN ABOVE every double, so a degenerate candidate
                    # would rank FIRST and eat shortlist slots, while
                    # null sorts last under desc (ADVICE r12 item 3)
                    "score": pd.array(s, dtype="Float64"),
                }
            )

    return cand.mapInPandas(score, schema=out_schema)


def ivfpq_search(
    index: DataFrame,
    centroids: DataFrame,
    books: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 3,
    nprobe: int = 4,
    shortlist: int = 32,
    residual: bool = False,
    method: str = "arrow",
    probe_method: str = "auto",
) -> DataFrame:
    """Probe-bounded ADC + exact re-rank: (query_id, neighbor_id, cosine).

    ``residual=True`` (index built with residual encoding): the
    quantized inner product decomposes as dot(q, v) ~ dot(q, centroid)
    + dot(q, residual) — the first term is exact per probed cell (a
    |Q| x nprobe metadata join), the second is the ADC sum over the
    residual codebooks' LUTs.

    1. probe_lists: nprobe nearest cells per query (|Q| x C, broadcast);
    2. the code table joins the BROADCAST probe set on centroid_id —
       only probed cells' code rows survive the scan (partition pruning
       when the index is partitioned by centroid_id);
    3. ADC scores those rows via the broadcast per-query LUT maps
       (keyed on code id — safe under non-contiguous codes);
    4. per-query top-``shortlist`` on the quantized score;
    5. exact cosine re-rank probes raw vectors for |Q| x shortlist rows
       only, and the true top-k of that re-ranking is returned.

    The corpus-sized pass reads (centroid_id, m-byte codes) for
    nprobe/C of the data; raw vectors are touched by a point-lookup-
    sized join.  Deterministic ties (score desc, neighbor_id asc).

    ``method="arrow"`` (default since r12, VERDICT r11 task 4) scores
    the probed code rows with :func:`_adc_scored_arrow` — the expr
    path's per-candidate ``zip_with``/``aggregate`` LUT fold costs a
    scale-INDEPENDENT ~10 s of Catalyst planning/codegen for the
    m x ksub expression trees (PLANS.md r8: ``ext_ivfpq_topk`` flat at
    11.5 s from sf0.01 to sf0.1), which the numpy twin replaces with
    one fancy-indexed gather per Arrow batch at bit-identical rounded
    scores (same fold order, same HALF_UP grid — see the twin's
    docstring).  ``method="expr"`` keeps the pure-SQL-lineage scoring
    the DuckDB oracle replays.
    """
    # One query collect serves the ADC scorer AND the probe dispatch
    # (r14, guide §2.4): probe_lists(method="auto") would otherwise
    # schedule its own |Q| count — on a bulk query set, a full extra
    # pass over the query corpus just to pick a result-identical rung.
    q_rows = None
    if method == "arrow":
        q_rows = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        ).collect()
    probes = probe_lists(
        centroids, queries, id_col=id_col, vec_col=vec_col, nprobe=nprobe,
        method=probe_method,
        n_queries=len(q_rows) if q_rows is not None else None,
    )
    if method == "arrow":
        cand = _adc_scored_arrow(
            index, probes, queries, books, centroids,
            id_col, vec_col, m, residual, _q_rows=q_rows,
        )
    elif method == "expr":
        if residual:
            c = centroids.select(
                F.col(id_col).alias("centroid_id"),
                F.col(vec_col).cast("array<double>").alias("__cv"),
            )
            probes = (
                probes.join(F.broadcast(c), "centroid_id")
                .withColumn("__qc_dot", _dot(F.col("__qv"), F.col("__cv")))
                .select("query_id", "centroid_id", "__qc_dot")
            )
            score = F.round(F.col("__qc_dot") + _adc_score(), 4)
        else:
            probes = probes.select("query_id", "centroid_id")
            score = _adc_score()
        q_lut = _query_luts(queries, books, id_col=id_col, vec_col=vec_col, m=m)
        cand = (
            index.withColumnRenamed(id_col, "neighbor_id")
            .join(F.broadcast(probes), "centroid_id")
            .join(F.broadcast(q_lut), "query_id")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", score.alias("score"))
        )
    else:
        raise ValueError(f"method must be 'arrow' or 'expr', got {method!r}")
    ws = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("neighbor_id"))
    short = (
        cand.withColumn("__rn", F.row_number().over(ws))
        .filter(F.col("__rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    raw = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__nv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    exact = (
        short.join(raw, "neighbor_id")
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
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        exact.withColumn("__rn", F.row_number().over(wk))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
