"""Lexical retrieval over the documents table: inverted term
statistics + BM25 top-k scoring — the search side of a training-data
pipeline (dataset exploration, decontamination triage, eval-set
mining) without any external index service.

Everything is declarative DataFrame algebra: the "inverted index" IS
the (term, doc, tf) aggregate, built by one explode + groupBy, and a
query batch is a small dimension joined against it.  At 100 TB the
postings table shuffles once on the term key and then serves any
number of query batches; ultra-common terms (stopwords) are both a
skew hazard and noise, so ``max_df_fraction`` prunes them exactly like
a production stopword list — the hot keys are dropped, not salted,
because their IDF contribution is ~0 anyway.

Determinism contract (oracle-checkable): tf / dl / df / N are exact
integers, avgdl = sum(dl)/N is one double division, and the per-term
BM25 contribution is a pure function of those — bit-identical in Spark
and DuckDB.  The per-(query, doc) SUM over matched terms is FP-order
sensitive, so scores are ROUNDed to 4 decimals before ranking and ties
break on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def term_stats(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(term, doc, tf) postings from whitespace tokenization — the
    inverted-index relation every scorer here joins against.

    Deliberately NO scan fan-out here (r13 optimization round): the
    plain (id, term) explode is ~3x cheaper than bm25's (dl folded in),
    and the interleaved A/B read the extra exchange as a 1.10 ratio on
    tfidf_top_terms — the §2.5 remedy only pays where the serial
    per-row work outweighs one exchange (see bm25_topk)."""
    return (
        docs.select(
            F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    qid_col: str,
    qtext_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_fraction: float = 0.5,
) -> DataFrame:
    """Top-k documents per query under BM25 (Lucene's non-negative IDF).

    score(q, d) = sum over distinct matched terms t of
        ln(1 + (N - df + 0.5) / (df + 0.5))
        * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    Distinct query terms (no query-side tf weighting) keep the oracle
    and the semantics simple; terms present in more than
    ``max_df_fraction`` of documents are pruned from scoring.

    Output: (qid, doc_id, rank, score) with rank 1..k per query —
    deterministic via the rounded-score + doc_id ordering.

    Plan shape (reworked in the r13 optimization round): the postings
    groupBy is the ONLY wide stage over the corpus — it runs exactly
    once.  Previously document frequencies came from a second full
    ``postings.groupBy(term)`` pass (the corpus tokenize + aggregate
    executed twice, measured as two ~1.4s single-task jobs per call at
    sf0.1 and two full corpus passes at any scale).  Now the query-term
    dimension broadcast-restricts the postings FIRST, and df is counted
    with a window over the matched rows: the broadcast join keeps every
    posting row of each query term, so ``count() over (partition by
    term)`` equals the full-corpus df exactly.  N/avgdl stay a narrow
    second scan (map-side partial agg, one scalar row).  Scoring is
    then a broadcast attach + one (qid, doc) reduction + a per-query
    window over at most |matched docs| rows.
    """
    # (doc, dl, term, tf) in ONE wide stage: dl is functional on the
    # doc id, so grouping by (id, dl, term) folds the length in without
    # a separate doc-length join.  The tokenize explode gets the §2.5
    # single-file fan-out (see term_stats) — profiled as the 1.6 s
    # serial wall of this scorer at sf0.1, structural no-op at scale.
    from ..core.parallelism import fan_out_for_compute

    postings = (
        fan_out_for_compute(docs.select(F.col(id_col), F.col(text_col)), id_col)
        .select(
            F.col(id_col),
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("dl"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # N and avgdl come from a narrow second pass over docs (map-side
    # partial agg, one scalar row) — cheaper than re-grouping postings.
    scalars = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size(F.split(F.col(text_col), " "))).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    qterms = (
        queries.select(
            F.col(qid_col), F.explode(F.split(F.col(qtext_col), " ")).alias("term")
        )
        .distinct()
    )
    # ONE corpus pass: broadcast-restrict postings to the query terms,
    # then count df over the matched rows — (doc, term) is unique after
    # the postings groupBy, so the per-term window count IS the
    # full-corpus document frequency of that term.
    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    ).withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        matched.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(scalars))
        .filter(F.col("df") <= F.col("n_docs") * max_df_fraction)
        .groupBy(qid_col, id_col)
        .agg(F.round(F.sum(idf * tf_part), 4).alias("score"))
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            qid_col,
            F.col(id_col),
            F.col("rank").cast("long").alias("rank"),
            "score",
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF — the keyword
    signal corpus browsers and topic-drift monitors run over training
    shards.

    score(t, d) = tf * ln((1 + N) / (1 + df))      (smoothed IDF > 0)

    tf/df/N are exact integers so the per-term double is bit-identical
    across engines; ranking is (rounded score desc, term asc) inside
    each document, making the top-k fully deterministic.

    Plan (reworked in the r13 optimization round): ONE corpus pass.
    Previously df came from a ``postings.groupBy(term)`` self-join, so
    the corpus tokenize + aggregate lineage executed twice and the join
    re-shuffled postings by term anyway.  Now ``count() over (partition
    by term)`` derives df from the single postings pass — same term-key
    shuffle the join needed, minus the duplicate corpus scan — and the
    per-doc window ranks at most |distinct terms in doc| rows, so no
    global window appears at any scale.
    """
    postings = term_stats(docs, id_col, text_col).withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        postings.crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            F.round(
                F.col("tf")
                * F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, F.col("rank").cast("long").alias("rank"), "term", "tfidf")
    )


def cluster_top_terms(
    docs_with_cluster: DataFrame,
    cluster_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Characteristic terms per cluster — cluster LABELING, the readout
    a curation dashboard shows next to each embedding cluster (and the
    sanity check before a SemDeDup pass prunes it).

    Clusters are treated as pseudo-documents: score(t, c) =
    tf_c(t) * ln((1 + C) / (1 + df(t))) with df = number of clusters
    containing t — the same smoothed-IDF integer-exact recipe as
    tfidf_top_terms, so the per-term double is bit-identical across
    engines and the top-k rank (rounded score desc, term asc) is fully
    deterministic.

    Plan (reworked in the r13 optimization round): one (cluster, term)
    count shuffle (corpus reduces to |clusters| x |vocab| rows), then
    df from a ``count() over (partition by term)`` window on those same
    rows — previously a ``tf.groupBy(term)`` self-join re-executed the
    corpus explode + aggregate lineage twice — and a per-cluster window
    over at most |cluster vocab| rows.  No global window, no
    corpus-sized broadcast.
    """
    words = docs_with_cluster.select(
        F.col(cluster_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = words.groupBy(cluster_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    n_clusters = docs_with_cluster.agg(
        F.count_distinct(F.col(cluster_col)).alias("n_clusters")
    )
    scored = (
        tf.crossJoin(F.broadcast(n_clusters))
        .select(
            F.col(cluster_col),
            "term",
            F.round(
                F.col("tf")
                * F.log((1 + F.col("n_clusters")) / (1 + F.col("df"))),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(cluster_col).orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(cluster_col),
            F.col("rank").cast("long").alias("rank"),
            "term",
            "score",
        )
    )


def rrf_fuse(
    ranked: list[DataFrame],
    query_col: str = "qid",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al., SIGIR 2009) of N ranked
    lists: score(q, d) = Σ_lists 1 / (k + rank_list(q, d)).

    The hybrid-retrieval combiner — fuse BM25's lexical top-k with an
    embedding ANN top-k without comparing their incommensurable scores;
    only ranks cross the boundary.  Each contribution is pinned to the
    exact integer ``round(1e6 / (k + rank))`` so the fused score is an
    order-independent BIGINT sum (oracle-replayable bit-for-bit).

    Scale: inputs are already top-k lists (|Q| x k rows — tiny relative
    to the corpora that produced them), so the union + groupBy(q, d)
    shuffles list-sized data only, and the per-query cut is a window
    over ≤ N·k rows per query.  Returns (query, doc, rrf_micro,
    n_lists) — n_lists tells reranker stages how many retrievers
    agreed on the candidate.
    """
    from functools import reduce

    parts = [
        r.select(
            F.col(query_col),
            F.col(doc_col),
            F.round(F.lit(1e6) / (F.lit(k) + F.col(rank_col)))
            .cast("long")
            .alias("__contrib"),
        )
        for r in ranked
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), parts)
    fused = unioned.groupBy(query_col, doc_col).agg(
        F.sum("__contrib").alias("rrf_micro"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    if topk is None:
        return fused
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_micro").desc(), F.col(doc_col)
    )
    return (
        fused.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= topk)
        .drop("__rn")
    )
