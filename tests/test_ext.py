"""Extension operators: dedup, similarity, text analysis."""

from __future__ import annotations

from pyspark.sql import functions as F

from rabbit_in_a_blender_spark.ext.dedup import (
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_sets,
)
from rabbit_in_a_blender_spark.ext.similarity import cosine_topk
from rabbit_in_a_blender_spark.ext.text import langid_heuristic, text_stats, token_counts


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id int, text string"
    )
    out = {r["canonical_id"]: r["dup_count"] for r in exact_dedup_groups(df, "doc_id", "text").collect()}
    assert out == {1: 2, 3: 1}


def test_shingle_sets(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id int, text string")
    sh = sorted(r["shingle"] for r in shingle_sets(df, "doc_id", "text", 3).collect())
    assert sh == ["a b c", "b c d"]


def test_minhash_lsh_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words compose this unrelated document about spark"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id int, text string"
    )
    sig = minhash_signatures(shingle_sets(df, "doc_id", "text", 3), "doc_id", 16)
    pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sig, "doc_id", 16, 4).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_jaccard_scores(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x"), (3, "z z2 z3 z4 z5")],
        "doc_id int, text string",
    )
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.1, exact=True).collect()}
    assert (1, 2) in out and out[(1, 2)] == 0.5  # 2 shared of 4 distinct shingles
    assert all(p != (1, 3) for p in out)


def test_ngram_jaccard_default_is_lsh_bounded(spark):
    """The default path derives MinHash-LSH candidates: its output is a
    subset of the exact scoring, and near-identical docs survive."""
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, "the quick brown fox jumps over the lazy dog again!"),
            (3, "completely unrelated text about something else entirely"),
        ],
        "doc_id int, text string",
    )
    exact = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.1, exact=True).collect()}
    default = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
               ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.1).collect()}
    assert set(default) <= set(exact)
    assert (1, 2) in default  # near-dup pair collides in every band
    for pair, score in default.items():
        assert score == exact[pair]


def test_cosine_topk_exact(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.01]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id int, embedding array<float>",
    )
    out = cosine_topk(df, df.filter(F.col("vec_id") == 0), "vec_id", "embedding", k=2)
    rows = [(r["neighbor_id"], r["cosine"]) for r in out.orderBy(F.desc("cosine")).collect()]
    assert [n for n, _ in rows] == [1, 2]
    assert rows[0][1] == 1.0 and rows[1][1] == 0.0


def test_text_stats_and_tokens(spark):
    df = spark.createDataFrame([(1, "aa bb cccc")], "doc_id int, text string")
    s = text_stats(df, "doc_id", "text").collect()[0]
    assert s["n_words"] == 3
    assert abs(s["avg_word_len"] - 8 / 3) < 1e-3
    assert abs(s["short_word_ratio"] - 2 / 3) < 1e-3
    t = token_counts(df, "doc_id", "text").collect()[0]
    assert t["n_ws_tokens"] == 3 and t["n_alnum_tokens"] == 3


def test_langid_heuristic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house"),
            (2, "der hund und die katze und das haus"),
            (3, "xyzzy plugh foobar"),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r["predicted_lang"] for r in langid_heuristic(df, "doc_id", "text").collect()}
    assert out == {1: "en", 2: "de", 3: "und"}


def test_quality_score_components(spark):
    from rabbit_in_a_blender_spark.ext.text import quality_score

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat."), (2, "zzz qqq")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in quality_score(df, "doc_id", "text").collect()}
    assert out[1]["n_words"] == 6
    assert out[1]["stopword_ratio"] > out[2]["stopword_ratio"] == 0.0
    assert 0.0 <= out[2]["quality"] <= out[1]["quality"] <= 1.0


def test_embed_cosine_near_dup_exact_and_lsh_recall(spark):
    from rabbit_in_a_blender_spark.core.io import load_tables
    from rabbit_in_a_blender_spark.ext.similarity import (
        cosine_near_dup_lsh,
        cosine_near_dup_pairs,
    )

    e = load_tables(spark, "/root/testdata/sf0.001", "embeddings")["embeddings"]
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(e, "vec_id", "embedding", 0.30).collect()
    }
    assert exact, "threshold should produce at least one pair at sf0.001"
    approx = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_lsh(e, "vec_id", "embedding", 0.30).collect()
    }
    assert approx <= exact, "LSH must never invent pairs (exact verify step)"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"sign-LSH recall too low: {recall:.2f}"


def test_lsh_bucket_cap_drops_hot_buckets(spark):
    from rabbit_in_a_blender_spark.ext.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_sets,
    )

    # 6 identical boilerplate docs (one hot bucket) + 2 near-dup docs
    rows = [(i, "common boiler plate text here always") for i in range(6)]
    rows += [(10, "alpha beta gamma delta epsilon"), (11, "alpha beta gamma delta zeta")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    sh = shingle_sets(df, "doc_id", "text", 3)
    sig = minhash_signatures(sh, "doc_id", 16)
    uncapped = lsh_candidate_pairs(sig, "doc_id", 16, 4)
    capped = lsh_candidate_pairs(sig, "doc_id", 16, 4, max_bucket_size=4)
    un = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    cp = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (10, 11) in un and (10, 11) in cp  # real near-dups survive the cap
    assert any(a < 6 and b < 6 for a, b in un)  # boilerplate pairs exist uncapped
    assert not any(a < 6 and b < 6 for a, b in cp)  # and are dropped when capped


def test_cosine_topk_arrow_matches_jvm(spark):
    """The Arrow/BLAS variant returns exactly the JVM fold's answer —
    driver fixture + randomized vectors, several partitionings."""
    import random

    from rabbit_in_a_blender_spark.ext.similarity import cosine_topk, cosine_topk_arrow

    rng = random.Random(5)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 6")
    for parts in (2, 7):
        got = {
            (r["query_id"], r["neighbor_id"], r["cosine"])
            for r in cosine_topk_arrow(
                df.repartition(parts), q, k=4
            ).collect()
        }
        ref = {
            (r["query_id"], r["neighbor_id"], r["cosine"])
            for r in cosine_topk(df, q, k=4).collect()
        }
        assert got == ref


def test_embedding_decontaminate_arrow_matches_jvm(spark):
    import random

    from rabbit_in_a_blender_spark.ext.decontam import (
        embedding_decontaminate,
        embedding_decontaminate_arrow,
    )

    rng = random.Random(9)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)], i % 5) for i in range(150)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    corpus, bench = df.filter("label != 0"), df.filter("label = 0")
    a = {tuple(r) for r in embedding_decontaminate(
        corpus, bench, "vec_id", "embedding", 0.3).collect()}
    b = {tuple(r) for r in embedding_decontaminate_arrow(
        corpus.repartition(5), bench, "vec_id", "embedding", 0.3).collect()}
    assert a == b and len(a) == 120


def test_round_half_up_matches_spark_round(spark):
    """The numpy HALF_UP helper must agree with Spark F.round on exact
    .5 ties (np.round is half-even — ADVICE r7) AND on shortest-decimal
    ties that are not float ties, e.g. 0.285 whose float*100 product is
    28.499999999999996 but whose repr Spark sees as a tie (ADVICE r8)."""
    import numpy as np
    from pyspark.sql import functions as F

    from rabbit_in_a_blender_spark.ext._rounding import (
        round_half_up,
        to_cents_half_up,
    )

    vals = [0.125, -0.125, 0.135, 2.5, -2.5, 0.5, 1.5, 10.005, -10.005,
            0.12345, 99.995, -0.0625, 3.14159, 0.0,
            # decimal-repr ties that are NOT float ties (ADVICE r8)
            0.285, -0.285, 1.015, 2.675, -2.675, 8.835, 0.0285, 1234.5675]
    # fuzz: 3-4 decimal-digit literals land on repr ties constantly
    rng = np.random.default_rng(8)
    vals += [round(float(x), 4) for x in rng.uniform(-100, 100, 60)]
    for digits in (0, 2, 3, 4):
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        jvm = [r[0] for r in df.select(F.round("v", digits)).collect()]
        np_side = round_half_up(np.array(vals), digits)
        assert jvm == list(np_side), (digits, jvm, list(np_side))
    cents_jvm = [
        r[0]
        for r in spark.createDataFrame([(v,) for v in vals], "v double")
        .select(F.round(F.col("v") * 100, 0).cast("long"))
        .collect()
    ]
    assert cents_jvm == list(to_cents_half_up(np.array(vals)))


def test_round_half_up_ulp_window_large_magnitude(spark):
    """The near-tie replay window must scale with the float ULP (ADVICE
    r9): at |scaled| ~1e12 one ULP is ~1.2e-4, so a shortest-decimal tie
    like 100000000.00005 sits 1.2e-4 from the .5 boundary — outside the
    old fixed 1e-6 window — and the fast path floors DOWN while Spark's
    BigDecimal(repr) sees the tie and rounds HALF_UP."""
    import numpy as np
    from pyspark.sql import functions as F

    from rabbit_in_a_blender_spark.ext._rounding import round_half_up

    vals = [
        100000000.00005, -100000000.00005, 100000001.00005,
        123456789.00015, -123456789.00015,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    jvm = [r[0] for r in df.select(F.round("v", 4)).collect()]
    np_side = list(round_half_up(np.array(vals), 4))
    assert jvm == np_side, (jvm, np_side)
    # the documented failing case, pinned explicitly
    assert np_side[0] == 100000000.0001


def test_embedding_decontaminate_arrow_string_ids(spark):
    """The Arrow variant derives the id type from the input schema, so
    string doc ids work like the JVM path (ADVICE r7)."""
    import random

    from rabbit_in_a_blender_spark.ext.decontam import (
        embedding_decontaminate,
        embedding_decontaminate_arrow,
    )

    rng = random.Random(3)
    rows = [
        (f"doc-{i}", [rng.gauss(0, 1) for _ in range(8)], i % 4)
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id string, embedding array<double>, label int")
    corpus, bench = df.filter("label != 0"), df.filter("label = 0")
    a = {tuple(r) for r in embedding_decontaminate(
        corpus, bench, "doc_id", "embedding", 0.3).collect()}
    b = {tuple(r) for r in embedding_decontaminate_arrow(
        corpus.repartition(3), bench, "doc_id", "embedding", 0.3).collect()}
    assert a == b and len(a) == 60


def test_langid_ngram_beats_marker_heuristic(spark):
    """A/B on held-out sentences (VERDICT r7 task 7): the char-n-gram
    profile classifier must beat the marker-word heuristic, which goes
    'und' (or wrong) whenever a sentence avoids the 5 marker words."""
    from rabbit_in_a_blender_spark.ext.text import langid_heuristic, langid_ngram

    fixtures = [
        # (id, text, true lang) — none of these sentences appear in the
        # seed profiles; several avoid the heuristic's marker words
        (1, "she walked home through quiet streets past closed shops", "en"),
        (2, "we should finish this work before winter comes again", "en"),
        (3, "my brother keeps three old bicycles in his garage", "en"),
        (4, "heute scheint wieder einmal überall warme helle sonne", "de"),
        (5, "mein bruder wohnt seit jahren in einem kleinen dorf", "de"),
        (6, "wir möchten morgen früh zusammen frische brötchen holen", "de"),
        (7, "demain matin nous irons chercher du pain frais ensemble", "fr"),
        (8, "mon frère habite depuis longtemps dans un petit village", "fr"),
        (9, "elle marche chaque soir au bord de cette rivière calme", "fr"),
        (10, "mañana por la mañana iremos juntos a comprar pan fresco", "es"),
        (11, "mi hermano vive desde hace años en un pueblo pequeño", "es"),
        (12, "ella camina cada tarde por la orilla del río tranquilo", "es"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in fixtures], "doc_id long, text string"
    )
    truth = {i: lang for i, _, lang in fixtures}
    heur = {
        r["doc_id"]: r["predicted_lang"]
        for r in langid_heuristic(df, "doc_id", "text").collect()
    }
    ngram = {
        r["doc_id"]: r["predicted_lang"]
        for r in langid_ngram(df, "doc_id", "text").collect()
    }
    acc = lambda pred: sum(pred[i] == truth[i] for i in truth) / len(truth)
    assert acc(ngram) >= 0.9, (acc(ngram), ngram)
    assert acc(ngram) > acc(heur), (acc(ngram), acc(heur))


def test_langid_ngram_empty_text_is_und(spark):
    from rabbit_in_a_blender_spark.ext.text import langid_ngram

    df = spark.createDataFrame([(1, ""), (2, "hello there friend")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in langid_ngram(df, "doc_id", "text").collect()}
    assert out[1]["predicted_lang"] == "und" and out[1]["oop_distance"] == -1
    assert out[2]["predicted_lang"] == "en"


def test_normalize_text_unicode_and_controls(spark):
    """NFC + control strip + whitespace collapse, pinned against known
    unicode fixtures (combining accents, control bytes, tab/newline
    runs) — the Spark pandas_udf and DuckDB's nfc_normalize implement
    the same normal form, so the catalog row hash-gates engine parity
    while this test pins the actual unicode behavior."""
    import unicodedata

    from rabbit_in_a_blender_spark.ext.text import normalize_text

    decomposed = "café"            # e + combining acute
    composed = unicodedata.normalize("NFC", decomposed)
    rows = [
        (1, decomposed),                  # NFC composes the accent
        (2, "a\x00b\x07c"),              # C0 controls stripped
        (3, "  lots\t\tof   space \n\n here  "),  # collapse + trim
        (4, "already clean"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in normalize_text(df, "doc_id", "text").collect()}
    assert got[1]["text_norm"] == composed and got[1]["changed"]
    assert got[1]["n_chars_raw"] == 5 and got[1]["n_chars_norm"] == 4
    assert got[2]["text_norm"] == "abc" and got[2]["changed"]
    assert got[3]["text_norm"] == "lots of space here" and got[3]["changed"]
    assert got[4]["text_norm"] == "already clean" and not got[4]["changed"]


def test_normalize_text_is_idempotent(spark):
    """normalize(normalize(x)) == normalize(x) — the cleanup stage can
    run at any pipeline position (or twice) without drift."""
    from rabbit_in_a_blender_spark.ext.text import normalize_text

    rows = [
        (1, "café  with   runs"),
        (2, "a\x00b\x07c\t\td"),
        (3, "  edge  \n\n spaces  "),
        (4, "plain"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = normalize_text(df, "doc_id", "text").select(
        "doc_id", F.col("text_norm").alias("text")
    )
    twice = normalize_text(once, "doc_id", "text")
    for r in twice.collect():
        assert not r["changed"], r


def test_langid_ngram_arrow_expr_parity(spark):
    """r13 optimization round: the mapInPandas classify twin must be
    integer-exact to the expr/SQL pipeline — same doc-profile ranks
    (count desc, gram asc), same out-of-place distances with the top_n
    absent-gram penalty, same smaller-code argmin tie-break.  The
    fixture includes unicode text, ties between languages, an empty
    doc, a null doc, and a doc shorter than max_n."""
    from rabbit_in_a_blender_spark.ext.text import langid_ngram

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and then naps"),
        (2, "el zorro marrón rápido salta sobre el perro perezoso hoy"),
        (3, "le renard brun rapide saute par dessus le chien paresseux"),
        (4, ""),
        (5, None),
        (6, "ab"),
        (7, "zzzz qqqq xxxx wwww kkkk jjjj vvvv"),  # garbage, large dist
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    arrow = {
        tuple(r)
        for r in langid_ngram(df, "doc_id", "text", method="arrow").collect()
    }
    expr = {
        tuple(r)
        for r in langid_ngram(df, "doc_id", "text", method="expr").collect()
    }
    assert arrow == expr, arrow ^ expr
