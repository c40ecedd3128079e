"""BM25 retrieval, bigram LM, per-group cap, blocklist screen."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rabbit_in_a_blender_spark.ext.retrieval import bm25_topk, term_stats
from rabbit_in_a_blender_spark.ext.sampling import per_group_cap
from rabbit_in_a_blender_spark.ext.scrub import blocklist_filter
from rabbit_in_a_blender_spark.ext.text import bigram_logprob


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana cherry apple"),
            (2, "banana cherry durian"),
            (3, "apple apple apple apple"),
            (4, "elderberry fig grape"),
        ],
        "doc_id int, text string",
    )


def test_term_stats_tf(spark):
    tf = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in term_stats(_docs(spark), "doc_id", "text").collect()
    }
    assert tf[(1, "apple")] == 2
    assert tf[(3, "apple")] == 4
    assert (4, "apple") not in tf


def test_bm25_exact_match_ranks_first(spark):
    docs = _docs(spark)
    q = spark.createDataFrame([(100, "elderberry fig")], "qid int, qtext string")
    out = bm25_topk(docs, q, "doc_id", "text", "qid", "qtext", k=3).collect()
    assert out[0]["doc_id"] == 4 and out[0]["rank"] == 1
    # no other doc contains either term
    assert len(out) == 1


def test_bm25_df_pruning_drops_ubiquitous_terms(spark):
    docs = spark.createDataFrame(
        [(i, "common rare" if i == 1 else "common other") for i in range(1, 5)],
        "doc_id int, text string",
    )
    q = spark.createDataFrame([(9, "common rare")], "qid int, qtext string")
    # 'common' is in 4/4 docs -> pruned at max_df_fraction=0.5; only
    # 'rare' scores, so doc 1 is the single hit.
    out = bm25_topk(docs, q, "doc_id", "text", "qid", "qtext", k=10).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_bm25_k_bound_and_rank_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "word filler%d" % i) for i in range(20)], "doc_id int, text string"
    )
    q = spark.createDataFrame([(0, "word")], "qid int, qtext string")
    out = bm25_topk(
        docs, q, "doc_id", "text", "qid", "qtext", k=5, max_df_fraction=1.0
    ).collect()
    assert len(out) == 5
    # identical scores everywhere -> doc_id ascending tie-break
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3, 4]
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]


def test_bigram_logprob_matches_hand_computation(spark):
    df = spark.createDataFrame([(1, "a b a b"), (2, "a b")], "doc_id int, text string")
    out = {r["doc_id"]: r["mean_bigram_logprob"] for r in
           bigram_logprob(df, "doc_id", "text", k=0.5).collect()}
    # bigrams: doc1 [ab, ba, ab], doc2 [ab] -> C(ab)=3, C(ba)=1
    # contexts: C(a.)=3? no: context a has ab(3) -> 3; context b has ba(1)
    # V = 2 distinct bigram types
    lp_ab = math.log((3 + 0.5) / (3 + 0.5 * 2))
    lp_ba = math.log((1 + 0.5) / (1 + 0.5 * 2))
    assert out[2] == round(lp_ab, 4) or abs(out[2] - lp_ab) < 5e-4
    expected1 = (2 * lp_ab + lp_ba) / 3
    assert abs(out[1] - expected1) < 5e-4


def test_bigram_logprob_single_word_doc_has_no_row(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "a b")], "doc_id int, text string")
    ids = {r["doc_id"] for r in bigram_logprob(df, "doc_id", "text").collect()}
    assert ids == {2}


def test_per_group_cap_bounds_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(30)], "doc_id int, source string"
    )
    out = per_group_cap(df, "doc_id", "source", cap=4)
    counts = {r["source"]: r["cnt"] for r in
              out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {"g0": 4, "g1": 4, "g2": 4}
    # stable under repartitioning
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in per_group_cap(df.repartition(7), "doc_id", "source", cap=4).collect()
    )
    assert a == b


def test_per_group_cap_keeps_small_groups_whole(spark):
    df = spark.createDataFrame([(1, "g"), (2, "g")], "doc_id int, source string")
    assert per_group_cap(df, "doc_id", "source", cap=10).count() == 2


def test_blocklist_token_exact_not_substring(spark):
    df = spark.createDataFrame(
        [(1, "the class is classy"), (2, "class class ass")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in
           blocklist_filter(df, "doc_id", "text", ["ass", "class"], max_hits=1).collect()}
    # 'classy' must NOT match 'class' or 'ass'
    assert out[1]["n_hits"] == 1 and out[1]["keep"]
    assert out[2]["n_hits"] == 3 and out[2]["n_distinct_hits"] == 2
    assert not out[2]["keep"]


def test_weighted_sample_respects_weights_and_cap(spark):
    from rabbit_in_a_blender_spark.ext.sampling import weighted_group_sample

    rows = [(i, "g", 1000.0 if i < 5 else 0.001) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id int, grp string, w double")
    out = [r["doc_id"] for r in
           weighted_group_sample(df, "doc_id", "grp", "w", k=5).collect()]
    assert len(out) == 5
    # weight ratio 1e6: the five heavy rows should dominate the sample
    assert len(set(out) & {0, 1, 2, 3, 4}) >= 4


def test_weighted_sample_excludes_nonpositive_and_short_groups(spark):
    from rabbit_in_a_blender_spark.ext.sampling import weighted_group_sample

    df = spark.createDataFrame(
        [(1, "g", 2.0), (2, "g", 0.0), (3, "g", -1.0), (4, "h", 1.0)],
        "doc_id int, grp string, w double",
    )
    out = {(r["doc_id"], r["grp"]) for r in
           weighted_group_sample(df, "doc_id", "grp", "w", k=3).collect()}
    # zero/negative weights never selected; group h has 1 < k rows
    assert out == {(1, "g"), (4, "h")}


def test_weighted_sample_deterministic_across_repartition(spark):
    from rabbit_in_a_blender_spark.ext.sampling import weighted_group_sample

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2), float(i + 1)) for i in range(40)],
        "doc_id int, grp string, w double",
    )
    a = sorted(r["doc_id"] for r in
               weighted_group_sample(df, "doc_id", "grp", "w", k=4).collect())
    b = sorted(r["doc_id"] for r in
               weighted_group_sample(df.repartition(9), "doc_id", "grp", "w", k=4).collect())
    assert a == b and len(a) == 8


def test_embedding_decontaminate_flags_semantic_copies(spark):
    from rabbit_in_a_blender_spark.ext.decontam import embedding_decontaminate

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "vec_id int, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [
            (1, [2.0, 0.0, 0.0]),    # same direction, different norm -> 1.0
            (2, [0.0, 1.0, 0.0]),    # orthogonal -> 0.0
            (3, [1.0, 1.0, 0.0]),    # 45 degrees -> ~0.7071
        ],
        "vec_id int, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in embedding_decontaminate(
        corpus, bench, "vec_id", "embedding", threshold=0.9
    ).collect()}
    assert out[1]["max_bench_cosine"] == 1.0 and out[1]["contaminated"]
    assert out[2]["max_bench_cosine"] == 0.0 and not out[2]["contaminated"]
    assert abs(out[3]["max_bench_cosine"] - 0.7071) < 1e-9
    assert not out[3]["contaminated"]
    # every corpus row kept (audit surface), none dropped
    assert set(out) == {1, 2, 3}


def test_cluster_top_terms_labels_clusters(spark):
    """Cluster-IDF kills shared vocabulary; each cluster is labeled by
    its distinctive terms with deterministic rank ties."""
    from rabbit_in_a_blender_spark.ext.retrieval import cluster_top_terms

    rows = [
        (0, "spark shuffle shuffle join the the"),
        (0, "shuffle codegen the"),
        (1, "genome protein protein the the"),
        (1, "protein enzyme the"),
    ]
    df = spark.createDataFrame(rows, "centroid_id long, text string")
    got = cluster_top_terms(df, "centroid_id", "text", k=2).collect()
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r["centroid_id"], []).append((r["rank"], r["term"]))
    # 'the' appears in BOTH clusters -> df=2, idf=ln(3/3)=0 -> never tops
    assert by_cluster[0] == [(1, "shuffle"), (2, "codegen")] or \
           by_cluster[0] == [(1, "shuffle"), (2, "join")]
    assert by_cluster[1][0] == (1, "protein")
    assert all(t != "the" for ranks in by_cluster.values() for _, t in ranks)


# --------------------------------------------------------------------------
# Reciprocal Rank Fusion (ext/retrieval.py::rrf_fuse)

def _ranked(spark, rows):
    return spark.createDataFrame(rows, ["qid", "doc_id", "rank"])


def test_rrf_fuse_exact_integer_math(spark):
    from rabbit_in_a_blender_spark.ext.retrieval import rrf_fuse

    sparse = _ranked(spark, [(1, 10, 1), (1, 11, 2)])
    dense = _ranked(spark, [(1, 11, 1), (1, 12, 2)])
    out = {
        r.doc_id: (r.rrf_micro, r.n_lists)
        for r in rrf_fuse([sparse, dense], k=60).collect()
    }
    # contributions: round(1e6/61)=16393, round(1e6/62)=16129
    assert out[10] == (16393, 1)
    assert out[11] == (16129 + 16393, 2)  # rank 2 sparse + rank 1 dense
    assert out[12] == (16129, 1)


def test_rrf_agreement_beats_single_list(spark):
    from rabbit_in_a_blender_spark.ext.retrieval import rrf_fuse

    # doc 20 is rank 1 in ONE list; doc 21 is rank 3 in BOTH lists.
    # 2/(60+3) > 1/(60+1), so the agreed-on doc must win the fusion.
    sparse = _ranked(spark, [(1, 20, 1), (1, 21, 3)])
    dense = _ranked(spark, [(1, 22, 1), (1, 21, 3)])
    top = rrf_fuse([sparse, dense], k=60, topk=1).collect()
    assert len(top) == 1 and top[0].doc_id == 21


def test_rrf_topk_cut_is_per_query_with_id_ties(spark):
    from rabbit_in_a_blender_spark.ext.retrieval import rrf_fuse

    # Two queries; query 2's docs tie exactly (same rank in one list
    # each), so the cut must break on doc_id.
    a = _ranked(spark, [(1, 1, 1), (1, 2, 2), (2, 7, 1)])
    b = _ranked(spark, [(1, 3, 1), (2, 5, 1)])
    out = rrf_fuse([a, b], k=60, topk=1).collect()
    got = {r.qid: r.doc_id for r in out}
    assert got[1] in (1, 3)  # equal 16393 micros -> lower doc_id wins
    assert got[1] == 1
    assert got[2] == 5  # tie at rank 1: doc 5 < doc 7


def test_perplexity_buckets_separate_fluent_from_salad(spark):
    """CCNet bucketing: documents made of the corpus's common
    transitions land in head; one-off word-salad lands in tail; the
    cut proportions follow the (0.25, 0.75) quantiles."""
    from rabbit_in_a_blender_spark.ext.text import perplexity_buckets

    fluent = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, fluent) for i in range(8)]
    # salad docs reuse corpus WORDS but in unseen orders (unique
    # transitions -> low smoothed conditional probability)
    salad_words = fluent.split(" ")
    for j in range(4):
        rotated = salad_words[j + 2:] + salad_words[: j + 2]
        rows.append((100 + j, " ".join(rotated[::-1])))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.bucket for r in
           perplexity_buckets(df, "doc_id", "text").collect()}
    assert len(out) == 12
    # every fluent doc scores identically -> all of them sit at the max
    # score; the top-quartile cut lands inside that tie, so fluent docs
    # are head and no salad doc can be
    assert all(out[i] == "head" for i in range(8))
    assert all(out[100 + j] in ("middle", "tail") for j in range(4))
    assert sum(1 for b in out.values() if b == "tail") >= 3
