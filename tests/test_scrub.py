"""PII redaction and repetition filters."""

from __future__ import annotations

from rabbit_in_a_blender_spark.ext.scrub import redact_pii, repetition_stats


def test_redact_pii_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.co or x.y+z@d.org today"),
            (2, "call +1-555-123-4567 or visit 10.0.0.1 now"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df, "doc_id", "text").collect()}
    assert out[1]["redacted"] == "mail <EMAIL> or <EMAIL> today"
    assert out[1]["n_redactions"] == 2
    assert "<PHONE>" in out[2]["redacted"] and "<IP>" in out[2]["redacted"]
    assert out[2]["n_redactions"] == 2
    assert out[3]["redacted"] == "nothing sensitive here"
    assert out[3]["n_redactions"] == 0


def test_repetition_stats_boilerplate_vs_clean(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "each word here is used exactly once total"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    # looping doc: all 3-grams identical, one word dominates
    assert out[1]["dup_ngram_ratio"] > 0.8
    assert out[1]["top_word_ratio"] == 1.0
    # repetition-free doc: no dup grams, every word 1/8 of the text
    assert out[2]["dup_ngram_ratio"] == 0.0
    assert out[2]["top_word_ratio"] == 0.125


def test_unigram_logprob_ranks_fluent_above_rare(spark):
    from rabbit_in_a_blender_spark.ext.text import unigram_logprob

    df = spark.createDataFrame(
        [
            (1, "the the the the"),          # most frequent word only
            (2, "the qzx the wvk"),          # half rare singletons
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["mean_logprob"] for r in unigram_logprob(df, "doc_id", "text").collect()}
    # corpus: the x6, qzx x1, wvk x1 (total 8)
    import math

    assert abs(out[1] - round(math.log(6 / 8), 4)) < 1e-9
    assert out[2] < out[1]  # rare words drag the score down


def test_chunk_documents_windows_and_edges(spark):
    from rabbit_in_a_blender_spark.ext.text import chunk_documents

    df = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(17))),  # 17 words
            (2, "short doc"),                            # shorter than window
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "doc_id", "text", max_words=8, overlap=2)
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"], r["chunk"], r["n_chunk_words"]) for r in out.collect())
    )
    # doc 1: stride 6 → chunks at words 0-7, 6-13, 12-16
    d1 = [r for r in rows if r[0] == 1]
    assert [r[1] for r in d1] == [0, 1, 2]
    assert d1[0][2].split(" ") == [f"w{i}" for i in range(8)]
    assert d1[1][2].split(" ") == [f"w{i}" for i in range(6, 14)]
    assert d1[2][2].split(" ") == [f"w{i}" for i in range(12, 17)]
    # overlap: last 2 words of chunk i == first 2 of chunk i+1
    assert d1[0][2].split(" ")[-2:] == d1[1][2].split(" ")[:2]
    # short doc: exactly one whole-doc chunk
    d2 = [r for r in rows if r[0] == 2]
    assert d2 == [(2, 0, "short doc", 2)]


def test_duplicated_window_fraction(spark):
    from rabbit_in_a_blender_spark.ext.scrub import duplicated_window_fraction

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),   # shares the first window with 2
            (2, "a b c d e f g h x y"),
            (3, "z z z z z z z z z z"),   # self-repeats collapse (distinct)
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_window_fraction"])
        for r in duplicated_window_fraction(df, "doc_id", "text", w=8).collect()
    }
    assert got[1] == (3, 1, 0.3333)
    assert got[2] == (3, 1, 0.3333)
    assert got[3] == (1, 0, 0.0)  # within-doc repeats are not corpus dups


def test_remove_repeated_lines_preserves_order(spark):
    from rabbit_in_a_blender_spark.ext.scrub import remove_repeated_lines

    df = spark.createDataFrame(
        [
            (1, "cookie banner\nreal one\nmiddle\ncookie banner\nreal two"),
            (2, "cookie banner\nother content"),
            (3, "unique only"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
        for r in remove_repeated_lines(df, "doc_id", "text", max_line_df=1).collect()
    }
    # both occurrences inside doc 1 drop; survivors keep document order
    assert got[1] == ("real one\nmiddle\nreal two", 5, 2)
    assert got[2] == ("other content", 2, 1)
    assert got[3] == ("unique only", 1, 0)

    # a doc that is ALL boilerplate comes back empty, not missing
    all_boiler = spark.createDataFrame(
        [(1, "x\nx"), (2, "x")], "doc_id long, text string"
    )
    got2 = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_lines(all_boiler, "doc_id", "text").collect()
    }
    assert got2 == {1: "", 2: ""}
