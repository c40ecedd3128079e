"""Benchmark decontamination for training-data pipelines: remove (or
flag) corpus documents that share word n-grams with an evaluation set.

The standard pretraining hygiene step (GPT-3 §C / PaLM / Llama reports
describe the same shape): build the set of distinct word n-grams in the
benchmark, then drop any training document containing one.

Spark-first design:
- benchmark n-grams are DISTINCT and broadcast — eval sets are tiny
  (thousands of docs) next to a 100 TB corpus, so the contaminated-doc
  probe is a broadcast semi/inner join, never a shuffle of the corpus;
- corpus shingling reuses :func:`..ext.dedup.shingle_sets` (split →
  transform → explode, all whole-stage-codegen'd JVM expressions);
- the per-doc overlap count aggregates (doc_id, shingle) pairs AFTER the
  broadcast join has filtered them to matches only — the shuffle carries
  matched pairs, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_sets


def benchmark_ngrams(bench: DataFrame, text_col: str, n: int = 8) -> DataFrame:
    """Distinct word n-grams of the benchmark set: one `shingle` column.

    Distinct here (small side) so the broadcast payload and the join
    fan-out are both minimal.
    """
    sh = shingle_sets(
        bench.select(F.lit(0).alias("__bid"), F.col(text_col)), "__bid", text_col, n=n
    )
    return sh.select("shingle").distinct()


def contamination_overlap(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    max_gram_df: int | None = None,
) -> DataFrame:
    """(id, n_shared_ngrams) for every corpus doc sharing >= 1 distinct
    word n-gram with the benchmark set.

    ``max_gram_df`` drops benchmark n-grams whose corpus document
    frequency exceeds the cap before counting overlap.  Two reasons:
    semantically, an n-gram appearing in thousands of corpus documents
    is boilerplate ("all rights reserved ..."), not benchmark leakage —
    the published decontamination recipes match on RARE n-grams for
    exactly this reason; operationally, a boilerplate gram is also the
    join's hot key (one broadcast row fanning out to every matching doc
    row), so the cap removes the skew and the false positives together.
    Costs one extra aggregation over the matched pairs only.
    """
    grams = F.broadcast(benchmark_ngrams(bench, text_col, n=n))
    matched = shingle_sets(corpus, id_col, text_col, n=n).join(grams, "shingle")
    if max_gram_df is not None:
        # `matched` feeds BOTH the df-count aggregation and the rare-gram
        # join; without a persist the corpus shingling + broadcast join
        # (the dominant cost) runs twice (ADVICE r5).  Matched pairs are
        # (id, shingle) rows, far smaller than the corpus — same persist
        # rationale as lsh_candidate_pairs.
        matched = matched.persist()
        df_counts = matched.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("__df")
        )
        rare = df_counts.filter(F.col("__df") <= max_gram_df).select("shingle")
        matched = matched.join(F.broadcast(rare), "shingle")
    return matched.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_ngrams")
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_shared: int = 1,
    max_gram_df: int | None = None,
) -> DataFrame:
    """Corpus minus contaminated docs (>= min_shared shared n-grams).

    Anti join on the matched-id set.  Contamination rates are typically
    well under 1%, so AQE turns this into a broadcast anti join at
    runtime; the explicit hint is deliberately omitted because the hit
    set's size is data-dependent (a benchmark that leaked wholesale into
    the corpus could make it large).
    """
    hits = contamination_overlap(
        corpus, bench, id_col, text_col, n=n, max_gram_df=max_gram_df
    ).filter(F.col("n_shared_ngrams") >= min_shared)
    return corpus.join(hits.select(id_col), id_col, "left_anti")


def embedding_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-space decontamination: flag corpus vectors whose max
    cosine to ANY benchmark vector reaches the threshold — the
    semantic companion to the n-gram overlap screen (paraphrased or
    reformatted eval items share no 8-gram but sit next to the
    original in embedding space).

    Output: (id, max_bench_cosine, contaminated).  Every corpus row is
    kept (the caller filters) so the screen doubles as a similarity
    audit.

    Scale shape: the benchmark side is eval-set-sized and broadcasts;
    scoring is a map-side |corpus| x |bench| loop with no shuffle until
    the per-id MAX — and MAX over exact per-pair doubles is
    order-insensitive, so the whole screen is oracle-reproducible.  For
    benchmark sets too big to broadcast, pre-bucket both sides with
    ``cosine_near_dup_lsh``'s hyperplanes and reuse this under the
    bucket join.
    """
    from .similarity import _dot, _norm

    b = bench.select(F.col(vec_col).cast("array<double>").alias("__vb"))
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__vc")
    )
    cos = _dot(F.col("__vc"), F.col("__vb")) / (
        _norm(F.col("__vc")) * _norm(F.col("__vb"))
    )
    return (
        c.crossJoin(F.broadcast(b))
        .select(F.col(id_col), cos.alias("__cos"))
        .groupBy(id_col)
        .agg(F.round(F.max("__cos"), round_digits).alias("max_bench_cosine"))
        .select(
            id_col,
            "max_bench_cosine",
            (F.col("max_bench_cosine") >= threshold).alias("contaminated"),
        )
    )


def embedding_decontaminate_arrow(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    round_digits: int = 4,
) -> DataFrame:
    """Arrow/BLAS formulation of :func:`embedding_decontaminate` — same
    output contract (pytest-pinned equality).

    The benchmark matrix is eval-set-sized and rides in the closure
    (the same "broadcast" the JVM variant does); each corpus Arrow
    batch takes ONE normalized matmul and a row-max — the per-pair
    crossJoin rows never materialize at all, which is where the JVM
    fold spends its time (measured in tools/scale_curve.py
    SPARK_GRAFT_SCALE_ONLY=brute, same shape as cosine top-k).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from rabbit_in_a_blender_spark.ext._rounding import round_half_up

    b_rows = bench.select(F.col(vec_col).cast("array<double>").alias("v")).collect()
    b_mat = np.array([r["v"] for r in b_rows], dtype=np.float64)
    b_mat = b_mat / np.linalg.norm(b_mat, axis=1, keepdims=True)

    def score(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            c = np.array(list(pdf["v"]), dtype=np.float64)
            c = c / np.linalg.norm(c, axis=1, keepdims=True)
            # HALF_UP like the JVM twin's F.round — np.round (half-even)
            # would flip the contaminated flag on a representable .5 tie
            best = round_half_up((c @ b_mat.T).max(axis=1), round_digits)
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"].to_numpy(),
                    "max_bench_cosine": best,
                    "contaminated": best >= threshold,
                }
            )

    c = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # The id keeps its source type (string doc ids work like the JVM path)
    out_schema = T.StructType(
        [
            T.StructField("__id", corpus.schema[id_col].dataType),
            T.StructField("max_bench_cosine", T.DoubleType()),
            T.StructField("contaminated", T.BooleanType()),
        ]
    )
    return c.mapInPandas(score, schema=out_schema).withColumnRenamed(
        "__id", id_col
    )
