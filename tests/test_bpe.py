"""BPE trainer + tokenizer (ext/bpe.py).

The Spark application path (chained lookbehind regexp_replace) is
cross-checked against an INDEPENDENT implementation of the published
algorithm — the Sennrich-style min-rank-first priority loop over
symbol lists, no regexes, no shared code — so a representation bug
can't cancel out.
"""

from __future__ import annotations

import re

import pytest

from rabbit_in_a_blender_spark.ext.bpe import (
    EXPR_MERGE_LIMIT,
    bpe_token_counts,
    bpe_tokenize,
    train_bpe,
    word_frequencies,
)

CORPUS = [
    (1, "the lowest lower low"),
    (2, "newest newer new news"),
    (3, "the widest wider wide"),
    (4, "aaaa aa aaaaaa"),  # repeated-symbol runs: the classic trap
    (5, "The LOWEST, newest!  wide-open low?"),
    (6, ""),
]


def _reference_tokenize(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent oracle: priority application on symbol lists."""
    rank = {pair: i for i, pair in enumerate(merges)}
    out: list[str] = []
    for w in re.findall("[a-z0-9]+", text.lower()):
        syms = list(w) + [">"]
        while len(syms) > 1:
            pairs = [(rank.get((a, b)), i) for i, (a, b) in enumerate(zip(syms, syms[1:]))]
            ranked = [(r, i) for r, i in pairs if r is not None]
            if not ranked:
                break
            best_rank = min(r for r, _ in ranked)
            a, b = merges[best_rank]
            # merge every occurrence left-to-right
            merged: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        out.extend(syms)
    return out


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


@pytest.fixture(scope="module")
def merges(corpus_df):
    return train_bpe(word_frequencies(corpus_df), num_merges=40)


def test_word_frequencies(corpus_df):
    wf = {r["word"]: r["freq"] for r in word_frequencies(corpus_df).collect()}
    assert wf["the"] == 3  # doc 1, 3, and lowercased doc 5
    assert wf["newest"] == 2
    assert wf["aaaa"] == 1
    assert "" not in wf


def test_train_bpe_deterministic_and_ordered(corpus_df):
    m1 = train_bpe(word_frequencies(corpus_df), num_merges=40)
    m2 = train_bpe(word_frequencies(corpus_df), num_merges=40)
    assert m1 == m2
    assert 0 < len(m1) <= 40
    # every merged symbol that appears on the left of a later merge must
    # have been produced by an earlier merge (rank-order well-formedness)
    produced = set("abcdefghijklmnopqrstuvwxyz0123456789>")
    for a, b in m1:
        assert a in produced and b in produced, (a, b)
        produced.add(a + b)


def test_train_bpe_learns_shared_suffixes(merges):
    # 'est>' or at least 'st>' should emerge from lowest/newest/widest
    formed = {a + b for a, b in merges}
    assert any(s in formed for s in ("est>", "st>", "est"))


def test_spark_matches_independent_reference(spark, corpus_df, merges):
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_tokenize(corpus_df, merges).collect()
    }
    for doc_id, text in CORPUS:
        assert got[doc_id] == _reference_tokenize(text, merges), (doc_id, text)


def test_arrow_fallback_identical(spark, corpus_df, merges):
    from rabbit_in_a_blender_spark.ext.bpe import _bpe_tokenize_arrow

    expr = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in bpe_tokenize(corpus_df, merges).collect()
    }
    arrow = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in _bpe_tokenize_arrow(corpus_df, merges, "text", "tokens").collect()
    }
    assert expr == arrow


def test_repeated_symbol_runs_merge_greedily(spark, corpus_df):
    # merge ('a','a') alone: 'aaaa' → [aa, aa, >], 'aaaaaa' → [aa,aa,aa,>]
    # a single-delimiter replace scheme would consume the shared
    # separator and yield [aa, a, a, >]
    out = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_tokenize(corpus_df, [("a", "a")]).collect()
    }
    assert out[4] == ["aa", "aa", ">", "aa", ">", "aa", "aa", "aa", ">"]


def test_detokenization_roundtrip(spark, corpus_df, merges):
    # stripping '>' and concatenating tokens reconstructs the normalized
    # words — no characters created or lost by the regex chain
    rows = bpe_tokenize(corpus_df, merges).collect()
    for r in rows:
        doc_text = dict(CORPUS)[r["doc_id"]]
        words = re.findall("[a-z0-9]+", doc_text.lower())
        rebuilt = "".join(r["tokens"]).split(">")
        assert [w for w in rebuilt if w] == words


def test_more_merges_never_increase_token_count(corpus_df):
    wf = word_frequencies(corpus_df)
    prev = None
    for n in (0, 5, 20, 40):
        merges = train_bpe(wf, num_merges=n)
        total = (
            bpe_tokenize(corpus_df, merges)
            .groupBy()
            .sum("n_tokens")
            .collect()[0][0]
        )
        if prev is not None:
            assert total <= prev
        prev = total


def test_malformed_merge_symbols_rejected(corpus_df):
    for bad in [("a|", "b"), ("a", "B"), ("a'", "b"), ("", "b"), ("a", "b c")]:
        with pytest.raises(ValueError):
            bpe_tokenize(corpus_df, [bad])


def test_token_counts_shape(corpus_df, merges):
    out = {r["doc_id"]: r["n_tokens"] for r in bpe_token_counts(corpus_df, merges).collect()}
    assert out[6] == 0  # empty doc
    assert all(v >= 0 for v in out.values())


def test_encode_ids_roundtrip_and_coverage(spark, corpus_df, merges):
    from rabbit_in_a_blender_spark.ext.bpe import bpe_encode_ids, bpe_vocab

    vocab = bpe_vocab(merges)
    assert vocab["a"] == 0 and vocab["0"] == 26 and vocab[">"] == 36
    assert len(vocab) <= 37 + len(merges)
    inv = {i: t for t, i in vocab.items()}
    toks = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_tokenize(corpus_df, merges).collect()
    }
    out = bpe_encode_ids(corpus_df, merges)
    rows = out.collect()
    for r in rows:
        ids = list(r["token_ids"])
        assert None not in ids, "every emitted token must be in vocab"
        assert [inv[i] for i in ids] == toks[r["doc_id"]]
        assert r["n_tokens"] == len(ids)
    # ids plan is JVM-only too (map literal, no python)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_training_from_plain_pairs_matches_dataframe_path(corpus_df):
    wf_df = word_frequencies(corpus_df)
    pairs = [(r["word"], r["freq"]) for r in wf_df.collect()]
    assert train_bpe(pairs, num_merges=25) == train_bpe(wf_df, num_merges=25)


def _synthetic_merges(n):
    """n structurally valid merges over the [a-z0-9] alphabet (pair
    coverage, not linguistic sense — exercises plan depth)."""
    import itertools

    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    return list(itertools.islice(itertools.product(alpha, alpha), n))


def test_property_replace_chain_matches_priority_loop():
    """Hypothesis sweep, no Spark: the literal replace-chain formulation
    (the exact Python-dialect twin of the Spark expression) must equal
    the independent priority-loop reference on random corpora and their
    trained merges."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rabbit_in_a_blender_spark.ext.bpe import _merge_replacements

    word = st.text(alphabet="abc0", min_size=1, max_size=8)
    corpus = st.lists(st.lists(word, min_size=1, max_size=12), min_size=1, max_size=8)

    def naive_train(pairs_in, num_merges):
        """Full-recount reference trainer (the original formulation) —
        the incremental engine trainer must match it exactly."""
        vocab: dict[tuple, int] = {}
        for word, freq in pairs_in:
            syms = tuple(list(word) + [">"])
            vocab[syms] = vocab.get(syms, 0) + int(freq)
        merges = []
        for _ in range(num_merges):
            counts: dict[tuple, int] = {}
            for syms, freq in vocab.items():
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + freq
            if not counts:
                break
            best = min(counts, key=lambda p: (-counts[p], p))
            if counts[best] < 2:
                break
            merges.append(best)
            a, b = best
            new_vocab: dict[tuple, int] = {}
            for syms, freq in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
            vocab = new_vocab
        return merges

    @settings(max_examples=60, deadline=None)
    @given(corpus)
    def check(docs):
        texts = [" ".join(ws) for ws in docs]
        freqs: dict[str, int] = {}
        for ws in docs:
            for w in ws:
                freqs[w] = freqs.get(w, 0) + 1
        merges = train_bpe(list(freqs.items()), num_merges=15)
        assert merges == naive_train(list(freqs.items()), 15)
        replacements = _merge_replacements(merges)

        def replace_chain(text):
            toks = []
            for w in re.findall("[a-z0-9]+", text.lower()):
                s = "|" + "||".join(list(w)) + "||>|"
                for pat, rep in replacements:
                    s = s.replace(pat, rep)
                toks.extend(t for t in s.split("|") if t)
            return toks

        for t in texts:
            assert replace_chain(t) == _reference_tokenize(t, merges)

    check()


def test_oracle_sql_matches_spark_on_duckdb(spark, corpus_df, merges):
    """bpe_token_count_sql generates the DuckDB twin of n_tokens from
    the same merge list — run both engines side by side on the corpus
    AND on the real sf0.001 documents table with its own trained
    merges.  This is the r7 catalog-query oracle, proven early."""
    import duckdb

    from rabbit_in_a_blender_spark.ext.bpe import bpe_token_count_sql

    con = duckdb.connect()

    # synthetic corpus (covers empty docs, punctuation, case, runs)
    spark_counts = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_counts(corpus_df, merges).collect()
    }
    con.execute(
        "CREATE TABLE corpus AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in CORPUS)  # no quotes in CORPUS
        + ") AS t(doc_id, text)"
    )
    expr = bpe_token_count_sql(merges)
    duck_counts = dict(
        con.execute(f"SELECT doc_id, {expr} FROM corpus").fetchall()
    )
    assert duck_counts == spark_counts

    # real fixture table, merges trained on it
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m2 = train_bpe(word_frequencies(docs), num_merges=60)
    got = {
        r["doc_id"]: r["n_tokens"] for r in bpe_token_counts(docs, m2).collect()
    }
    expr2 = bpe_token_count_sql(m2)
    want = dict(
        con.execute(
            "SELECT doc_id, "
            + expr2
            + " FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
        ).fetchall()
    )
    assert got == want and len(got) == 500


def test_tokenize_then_pack_composition(spark):
    """The real training-prep path: documents → BPE token counts →
    next-fit packing into budget-bounded bins.  Composition check on
    the sf0.001 fixture with merges trained on it."""
    from pyspark.sql import functions as F

    from rabbit_in_a_blender_spark.ext.bpe import bpe_token_counts
    from rabbit_in_a_blender_spark.ext.packing import pack_next_fit

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = train_bpe(word_frequencies(docs), num_merges=60)
    counts = bpe_token_counts(docs, merges).withColumn(
        "n_tokens", F.col("n_tokens").cast("long")
    )
    budget = 512
    packed = pack_next_fit(counts, "doc_id", "n_tokens", budget=budget)
    loads = (
        packed.groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("load"), F.count("*").alias("n"))
        .collect()
    )
    assert len(loads) > 1
    for r in loads:
        assert r["load"] <= budget or r["n"] == 1  # oversize docs solo
    assert packed.count() == docs.count()  # every doc placed exactly once


def test_expr_merge_limit_actually_plans_and_runs(spark, corpus_df):
    """EXPR_MERGE_LIMIT must stay below the measured JVM
    StackOverflowError point (512 on Spark 4.1): the limit-sized chain
    has to both convert and execute."""
    merges = [(a, b) for a, b in _synthetic_merges(EXPR_MERGE_LIMIT)]
    out = bpe_tokenize(corpus_df, merges)
    assert out.count() == len(CORPUS)


def test_over_limit_switches_to_arrow(spark, corpus_df):
    merges = [(a, b) for a, b in _synthetic_merges(EXPR_MERGE_LIMIT + 1)]
    plan = bpe_tokenize(corpus_df, merges)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_expr_path_plan_is_jvm_only(corpus_df, merges):
    """The ≤EXPR_MERGE_LIMIT path must stay in whole-stage codegen —
    no BatchEvalPython / ArrowEvalPython / mapInPandas in the plan."""
    assert len(merges) <= EXPR_MERGE_LIMIT
    plan = bpe_tokenize(corpus_df, merges)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
