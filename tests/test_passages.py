"""Duplicate-passage detection/removal (ext/passages.py)."""

from __future__ import annotations

from rabbit_in_a_blender_spark.core.caching import unpersist_intermediates
from rabbit_in_a_blender_spark.ext.passages import (
    duplicate_passages,
    remove_duplicate_passages,
)

BOILER = "all rights reserved by the site owner"  # 7 words


def _corpus(spark):
    rows = [
        (1, f"unique alpha words one {BOILER} trailing tail"),
        (2, f"different beta content two {BOILER} other ending"),
        (3, "completely original document with no repeats at all"),
        (4, BOILER),  # fully-boilerplate doc
        (5, "short doc"),  # fewer than k words: no grams, untouched
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_passages_finds_boilerplate(spark):
    inv = duplicate_passages(_corpus(spark), "doc_id", "text", k=4).collect()
    # the 7-word boilerplate in 3 docs yields 4 duplicated 4-grams,
    # each occurring 3 times across 3 distinct docs
    assert len(inv) == 4
    assert all(r["n_occurrences"] == 3 and r["n_docs"] == 3 for r in inv)


def test_remove_duplicate_passages_cuts_whole_span(spark):
    out = remove_duplicate_passages(_corpus(spark), "doc_id", "text", k=4)
    got = {r["doc_id"]: r for r in out.collect()}
    unpersist_intermediates(out)
    # the whole 7-word boilerplate vanishes, not just its first 4 words
    assert got[1]["text_clean"] == "unique alpha words one trailing tail"
    assert got[1]["n_removed"] == 7 and got[1]["n_words"] == 13
    assert got[2]["text_clean"] == "different beta content two other ending"
    # untouched docs keep their text verbatim
    assert got[3]["n_removed"] == 0
    assert got[3]["text_clean"] == "completely original document with no repeats at all"
    # fully-boilerplate doc survives as '' with explicit accounting
    assert got[4]["text_clean"] == "" and got[4]["n_removed"] == 7
    # sub-k docs yield no grams and pass through
    assert got[5]["text_clean"] == "short doc" and got[5]["n_removed"] == 0


def test_remove_duplicate_passages_within_doc_repeats(spark):
    # the SAME doc repeating a k-gram counts toward min_total
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam unique closing words here")],
        "doc_id long, text string",
    )
    out = remove_duplicate_passages(df, "doc_id", "text", k=4)
    row = out.collect()[0]
    unpersist_intermediates(out)
    assert row["text_clean"] == "unique closing words here"
    assert row["n_removed"] == 6


def test_remove_duplicate_passages_releases_caches(spark):
    sc = spark.sparkContext
    before = len(sc._jsc.getPersistentRDDs())
    out = remove_duplicate_passages(_corpus(spark), "doc_id", "text", k=4)
    out.collect()
    assert len(sc._jsc.getPersistentRDDs()) > before
    unpersist_intermediates(out)
    assert len(sc._jsc.getPersistentRDDs()) == before


# --- property test vs a pure-Python reference -------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny vocabulary forces cross-document k-gram collisions
_doc_strategy = st.lists(
    st.lists(st.sampled_from(list("abcd")), min_size=1, max_size=12).map(
        lambda ws: " ".join(ws)
    ),
    min_size=1,
    max_size=8,
)


def _reference_removal(texts: list[str], k: int, min_total: int):
    """Independent pure-Python model of remove_duplicate_passages."""
    from collections import Counter

    grams: Counter = Counter()
    doc_grams = []
    for t in texts:
        w = t.split(" ")
        gs = [tuple(w[i : i + k]) for i in range(len(w) - k + 1)] if len(w) >= k else []
        doc_grams.append(gs)
        grams.update(gs)
    out = []
    for t, gs in zip(texts, doc_grams):
        w = t.split(" ")
        covered = set()
        for i, g in enumerate(gs):
            if grams[g] >= min_total:
                covered.update(range(i, i + k))
        kept = [x for i, x in enumerate(w) if i not in covered]
        out.append((len(w), len(w) - len(kept), " ".join(kept)))
    return out


@given(texts=_doc_strategy)
@_SLOW
def test_remove_duplicate_passages_matches_python_reference(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = remove_duplicate_passages(df, "doc_id", "text", k=3, min_total=2)
    got = {r["doc_id"]: (r["n_words"], r["n_removed"], r["text_clean"])
           for r in out.collect()}
    unpersist_intermediates(out)
    ref = _reference_removal(texts, k=3, min_total=2)
    for i, expected in enumerate(ref):
        assert got[i] == expected, (i, texts[i], got[i], expected)


def test_near_duplicate_passages_containment_and_near_miss(spark):
    """LSH-passages ⊇ aligned exact passages (jaccard 1.0 shares every
    band), and a one-word edit — invisible to the exact k-gram matcher
    at its repeat threshold — is still caught above threshold."""
    from rabbit_in_a_blender_spark.ext.passages import near_duplicate_passages

    span = ("w%d " * 16) % tuple(range(16))  # 16 distinct words
    edited = span.split()
    edited[7] = "EDIT"  # one-word edit mid-span
    rows = [
        (1, span.strip()),                     # exact copy, aligned at 0
        (2, span.strip()),                     # exact copy, aligned at 0
        (3, " ".join(edited)),                 # near-miss copy
        (4, "totally unrelated words " * 4),   # noise
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = near_duplicate_passages(
        df, "doc_id", "text", window=16, stride=8, k=3,
        num_hashes=8, bands=4, threshold=0.35,
    )
    got = {(r["id_a"], r["win_a"], r["id_b"], r["win_b"]): r["jaccard"]
           for r in out.collect()}
    unpersist_intermediates(out)
    # containment: the aligned exact pair is present with jaccard 1.0
    assert got[(1, 0, 2, 0)] == 1.0
    # near-miss: the edited copy pairs with both originals above threshold
    # (one edited word kills k=3 grams overlapping position 7; 11 of 14
    # shingles survive → jaccard 11/17 ≈ 0.647)
    assert got[(1, 0, 3, 0)] >= 0.35 and got[(2, 0, 3, 0)] >= 0.35
    # noise doc never pairs
    assert not any(4 in (ka[0], ka[2]) for ka in got)


def test_remove_near_duplicate_passages_keep_first(spark):
    """The lower-id doc is canonical; near-dup window occurrences are
    cut from higher-id docs only, edits included."""
    from rabbit_in_a_blender_spark.ext.passages import (
        remove_near_duplicate_passages,
    )

    span = " ".join(f"w{i}" for i in range(16))
    edited = span.split()
    edited[7] = "EDIT"
    rows = [
        (1, span),                            # canonical
        (2, span),                            # exact copy -> emptied
        (3, " ".join(edited)),                # near-miss copy -> emptied
        (4, " ".join(f"n{i}" for i in range(16))),  # noise, untouched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_near_duplicate_passages(
        df, "doc_id", "text", window=16, stride=8, k=3,
        num_hashes=8, bands=4, threshold=0.35,
    )
    got = {r["doc_id"]: r for r in out.collect()}
    unpersist_intermediates(out)
    assert got[1]["text_clean"] == span and got[1]["n_removed"] == 0
    assert got[2]["text_clean"] == "" and got[2]["n_removed"] == 16
    assert got[3]["text_clean"] == "" and got[3]["n_removed"] == 16
    assert got[4]["n_removed"] == 0 and got[4]["n_words"] == 16


def test_near_duplicate_passages_partitioning_invariant(spark):
    """Pair set and jaccards are independent of input partitioning —
    determinism beyond the fixed-partitioning hash oracle."""
    import random

    from rabbit_in_a_blender_spark.core.caching import unpersist_intermediates
    from rabbit_in_a_blender_spark.ext.passages import near_duplicate_passages

    rng = random.Random(4)
    vocab = [f"tok{i}" for i in range(30)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(40)))
            for i in range(60)]
    # plant a shared aligned window
    rows[50] = (50, rows[10][1])
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(frame):
        out = near_duplicate_passages(frame, "doc_id", "text", threshold=0.2)
        got = {(r["id_a"], r["win_a"], r["id_b"], r["win_b"], r["jaccard"])
               for r in out.collect()}
        unpersist_intermediates(out)
        return got

    base = pairs(df)
    assert any(p[0] == 10 and p[2] == 50 for p in base)  # planted twin found
    assert pairs(df.repartition(9, "doc_id")) == base
    assert pairs(df.coalesce(1)) == base


def test_near_duplicate_passages_tail_window_clamp(spark):
    """ADVICE r9: when (len-window) % stride != 0 a clamped final window
    starts at len-window, so a duplicated TAIL passage (here the last 16
    of 30 words, ending beyond the stride grid's coverage) is detected
    and removable.  The stride-aligned windows (0, 8) stay below the
    verification threshold, so the clamped window is the only signal."""
    from rabbit_in_a_blender_spark.core.caching import unpersist_intermediates
    from rabbit_in_a_blender_spark.ext.passages import (
        near_duplicate_passages,
        remove_near_duplicate_passages,
    )

    shared = " ".join(f"s{i}" for i in range(16))
    rows = [
        (1, " ".join(f"a{i}" for i in range(14)) + " " + shared),
        (2, " ".join(f"b{i}" for i in range(14)) + " " + shared),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = near_duplicate_passages(
        df, "doc_id", "text", window=16, stride=8, k=3,
        num_hashes=8, bands=4, threshold=0.6,
    )
    got = {(r["id_a"], r["win_a"], r["id_b"], r["win_b"]): r["jaccard"]
           for r in pairs.collect()}
    unpersist_intermediates(pairs)
    # the clamped windows at start 14 are identical
    assert got[(1, 14, 2, 14)] == 1.0
    # stride-grid windows share at most a suffix and stay under 0.6
    assert all(wa == 14 and wb == 14 for (_, wa, _, wb) in got)
    # removal cuts the tail from the higher-id doc only
    out = remove_near_duplicate_passages(
        df, "doc_id", "text", window=16, stride=8, k=3,
        num_hashes=8, bands=4, threshold=0.6,
    )
    byid = {r["doc_id"]: r for r in out.collect()}
    unpersist_intermediates(out)
    assert byid[1]["n_removed"] == 0
    assert byid[2]["n_removed"] == 16
    assert byid[2]["text_clean"] == " ".join(f"b{i}" for i in range(14))
