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
star); parity target is FAISS IVFADC semantics without residual
encoding (codebooks trained on the raw vectors, as in OPQ-less
IVFFlat+PQ setups) — residuals would couple codebook training to the
coarse quantizer and buy little at ksub<=256 on normalized embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ivf import build_ivf_index, probe_lists
from .pq import _adc_score, _query_luts, pq_encode
from .similarity import _dot, _norm


def build_ivfpq_index(
    corpus: DataFrame,
    centroids: DataFrame,
    books: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
) -> DataFrame:
    """(id, centroid_id, codes): nearest-centroid assignment + PQ encode
    in one narrow pass — both the centroid cell and the codebooks ride
    as broadcast 1-row attaches, so the build shuffles nothing.

    Persist with ``.write.partitionBy("centroid_id")`` so searches prune
    to the probed cells at the parquet-scan level.
    """
    assigned = build_ivf_index(corpus, centroids, id_col=id_col, vec_col=vec_col)
    return pq_encode(
        assigned, books, id_col=id_col, vec_col=vec_col, m=m, keep=("centroid_id",)
    )


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
) -> DataFrame:
    """Probe-bounded ADC + exact re-rank: (query_id, neighbor_id, cosine).

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
    """
    probes = probe_lists(
        centroids, queries, id_col=id_col, vec_col=vec_col, nprobe=nprobe
    ).select("query_id", "centroid_id")
    q_lut = _query_luts(queries, books, id_col=id_col, vec_col=vec_col, m=m)
    cand = (
        index.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(probes), "centroid_id")
        .join(F.broadcast(q_lut), "query_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", _adc_score().alias("score"))
    )
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
