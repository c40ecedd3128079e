"""Text scrubbing and repetition filters for training-data pipelines.

- :func:`redact_pii` — regex redaction of emails / phone numbers / IPv4
  addresses (the standard pre-training scrub pass).  Patterns stick to
  syntax that Java regex (Spark) and RE2 (DuckDB) treat identically, so
  every redaction decision is oracle-checkable.  For production-grade
  NER-based scrubbing swap in a model behind ``mapInPandas``; the
  column contract stays the same.
- :func:`repetition_stats` — Gopher-style within-document repetition
  signals: the fraction of word n-grams that are repeats of an earlier
  n-gram in the same doc, and the top single-word frequency share.
  High values mark boilerplate/spam for the quality filter.

Both are narrow, JVM-side projections: zero shuffle, full codegen, cost
is one scan at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) in both engines' shared regex dialect.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+", "<EMAIL>"),
    (r"\+?[0-9][0-9()\-\. ]{7,}[0-9]", "<PHONE>"),
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
)


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, redacted, n_redactions): text with PII spans replaced by
    typed placeholders, plus how many spans were hit.

    Patterns apply in PII_PATTERNS order (phone after email so an
    address's digits aren't half-eaten; IP last — any IP-like string
    inside an already-redacted span is gone).  Counting happens BEFORE
    replacement on the original text, per pattern.
    """
    redacted = F.col(text_col)
    n = F.lit(0)
    for pat, repl in PII_PATTERNS:
        n = n + F.regexp_count(redacted, F.lit(pat))
        redacted = F.regexp_replace(redacted, pat, repl)
    return df.select(
        F.col(id_col),
        redacted.alias("redacted"),
        n.cast("long").alias("n_redactions"),
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, dup_ngram_ratio, top_word_ratio) repetition signals.

    dup_ngram_ratio = 1 - distinct(n-grams)/total(n-grams): 0 for
    repetition-free text, →1 for looping boilerplate.  top_word_ratio =
    occurrences of the most frequent word / word count (Gopher's
    "fraction of characters in most common word" analog, word-count
    based so both engines compute it exactly).
    """
    words = F.split(F.col(text_col), " ")
    grams = F.expr(
        f"transform(sequence(0, greatest(size(split({text_col}, ' ')) - {n}, 0)), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {n})))"
    )
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    # top word frequency: sort the words, then a linear fold tracking the
    # longest equal-run — O(n log n) per doc (a transform-over-distinct
    # with a nested filter would be O(n^2): quadratic on long documents).
    top = F.aggregate(
        F.array_sort(words),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(1).alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(1),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return df.select(
        F.col(id_col),
        F.round(F.lit(1.0) - distinct / total, 4).alias("dup_ngram_ratio"),
        F.round(top / F.size(words), 4).alias("top_word_ratio"),
    )


def duplicated_window_fraction(
    df: DataFrame, id_col: str, text_col: str, w: int = 8
) -> DataFrame:
    """Substring-level duplication signal: the share of each document's
    distinct ``w``-word windows that also appear in ANOTHER document —
    the document-granular form of the suffix-substring dedup used by
    the published LLM corpus pipelines (duplicated long substrings mark
    boilerplate and cross-site mirror text that document-level MinHash
    misses).

    Returns (id, n_windows, n_dup_windows, dup_window_fraction).

    Scale shape: windows are md5-hashed BEFORE the aggregation, so the
    two shuffles (window-df groupBy, hash join back) carry 16-byte
    digests, never text.  (id, hash) rows are distinct by construction
    so COUNT(*) per hash IS the document frequency — no countDistinct
    re-shuffle.
    """
    from .dedup import shingle_sets

    sh = shingle_sets(df, id_col, text_col, n=w).select(
        F.col(id_col), F.md5(F.col("shingle")).alias("__h")
    )
    wdf = sh.groupBy("__h").agg(F.count(F.lit(1)).alias("__df"))
    dup = F.sum(F.when(F.col("__df") >= 2, 1).otherwise(0)).cast("long")
    return (
        sh.join(wdf, "__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            dup.alias("n_dup_windows"),
        )
        .withColumn(
            "dup_window_fraction",
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 4),
        )
    )


def remove_repeated_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_line_df: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """CCNet-style corpus-level line dedup: drop every line that occurs
    in more than ``max_line_df`` distinct documents (navigation chrome,
    cookie banners, boilerplate headers — the lines whose document
    frequency explodes), preserving the surviving lines' order.

    Returns (id, cleaned text, n_lines, n_removed).

    Scale shape: lines are md5-hashed for the df aggregation (digest
    shuffle); the rebuild is one groupBy(id) with an array sort over
    (pos, line) structs — per-document-sized state, no window.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__line"),
    ).withColumn("__h", F.md5(F.col("__line")))
    ldf = (
        lines.select(id_col, "__h")
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    flagged = lines.join(ldf, "__h").select(
        F.col(id_col),
        F.struct(
            F.col("__pos").alias("pos"),
            F.col("__line").alias("line"),
            (F.col("__df") <= max_line_df).alias("keep"),
        ).alias("__e"),
    )
    sorted_e = F.array_sort(F.collect_list("__e"))
    kept = F.filter(sorted_e, lambda x: x["keep"])
    return flagged.groupBy(id_col).agg(
        F.concat_ws(sep, F.transform(kept, lambda x: x["line"])).alias(text_col),
        F.size(sorted_e).cast("long").alias("n_lines"),
        (F.size(sorted_e) - F.size(kept)).cast("long").alias("n_removed"),
    )


def blocklist_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    blocklist: list[str],
    max_hits: int = 0,
) -> DataFrame:
    """UT1/LDNOOBW-style blocklist screening: per-document counts of
    blocklisted tokens plus a keep flag.

    Output columns: (id, n_hits — total occurrences of any blocklisted
    token, n_distinct_hits — how many distinct blocklist entries
    matched, keep — n_hits <= max_hits).

    Token-exact matching against whitespace words (the standard list
    semantics — substring matching false-positives on e.g. 'class').
    The list ships as a broadcast array literal: a narrow, zero-shuffle
    projection with whole-stage codegen; word-boundary regex
    alternation would be quadratic in list size, array_contains over a
    sorted literal is not.  For 10k+ entry production lists swap the
    literal for a broadcast join against an exploded token table —
    the output contract stays the same.
    """
    arr = F.array(*[F.lit(t) for t in sorted(set(blocklist))])
    words = F.split(F.col(text_col), " ")
    hits = F.filter(words, lambda w: F.array_contains(arr, w))
    return df.select(
        F.col(id_col),
        F.size(hits).cast("long").alias("n_hits"),
        F.size(F.array_distinct(hits)).cast("long").alias("n_distinct_hits"),
        (F.size(hits) <= max_hits).alias("keep"),
    )
