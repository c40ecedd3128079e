"""Training-data-prep operators: sampling/splits, decontamination,
sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from rabbit_in_a_blender_spark.ext.decontam import (
    contamination_overlap,
    decontaminate,
)
from rabbit_in_a_blender_spark.ext.packing import bin_summary, pack_next_fit
from rabbit_in_a_blender_spark.ext.sampling import (
    deterministic_sample,
    fraction_threshold,
    hash_bucket,
    stratified_sample,
    train_val_test_split,
)


def _ids(spark, n=2000):
    return spark.range(n).select(F.col("id").alias("k"))


def test_fraction_threshold_bounds():
    assert fraction_threshold(0.0) == "00000000"
    assert fraction_threshold(1.0) == "g"
    assert fraction_threshold(0.25) == "40000000"
    assert fraction_threshold(0.5) == "80000000"


def test_uniform_sample_rate_and_determinism(spark):
    df = _ids(spark)
    a = deterministic_sample(df, "k", 0.3, seed="s").collect()
    b = deterministic_sample(df, "k", 0.3, seed="s").collect()
    assert sorted(a) == sorted(b)
    # rate within a loose binomial band for n=2000
    assert 0.25 < len(a) / 2000 < 0.35
    # different seed → different membership
    c = {r["k"] for r in deterministic_sample(df, "k", 0.3, seed="t").collect()}
    assert c != {r["k"] for r in a}


def test_sample_is_stable_under_corpus_growth(spark):
    """A kept key stays kept when the corpus doubles — the property
    DataFrame.sample does NOT have."""
    small = {r["k"] for r in deterministic_sample(_ids(spark, 1000), "k", 0.2).collect()}
    big = {r["k"] for r in deterministic_sample(_ids(spark, 2000), "k", 0.2).collect()}
    assert small == {k for k in big if k < 1000}


def test_nested_fractions_are_subsets(spark):
    """Lower fraction ⊂ higher fraction at the same seed (threshold
    monotonicity) — enables consistent sample laddering."""
    df = _ids(spark)
    s10 = {r["k"] for r in deterministic_sample(df, "k", 0.1, seed="s").collect()}
    s30 = {r["k"] for r in deterministic_sample(df, "k", 0.3, seed="s").collect()}
    assert s10 < s30


def test_stratified_sample_rates(spark):
    df = spark.range(3000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "a")
        .when(F.col("id") % 3 == 1, "b")
        .otherwise("c")
        .alias("g"),
    )
    out = stratified_sample(df, "k", "g", {"a": 0.5, "b": 0.05}, default_fraction=0.0)
    counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert 400 < counts.get("a", 0) < 600
    assert 20 < counts.get("b", 0) < 90
    assert "c" not in counts  # default 0.0 drops the unlisted stratum


def test_split_assign_partitions_everything(spark):
    df = _ids(spark)
    out = train_val_test_split(df, "k", (0.8, 0.1, 0.1), seed="sp")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert 1450 < counts["train"] < 1750
    # stable across recomputation AND repartitioning
    again = train_val_test_split(df.repartition(7), "k", (0.8, 0.1, 0.1), seed="sp")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_hash_bucket_matches_duckdb(spark):
    import duckdb

    got = spark.range(50).select(
        F.col("id"), hash_bucket(F.col("id"), "x").alias("h")
    ).collect()
    want = dict(
        duckdb.sql(
            "SELECT i, substr(md5(CAST(i AS VARCHAR) || ':x'), 1, 8) "
            "FROM range(50) t(i)"
        ).fetchall()
    )
    assert {r["id"]: r["h"] for r in got} == want


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "the quick brown fox went home early today"),
        (4, "totally unrelated words appear in this one"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_overlap_counts(spark):
    corpus = _docs(spark)
    bench = spark.createDataFrame(
        [(9, "the quick brown fox likes snow")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in contamination_overlap(corpus, bench, "doc_id", "text", n=3).collect()
    }
    # bench 3-grams: {the quick brown, quick brown fox, brown fox likes, fox likes snow}
    assert out == {1: 2, 3: 2}


def test_decontaminate_removes_hits_only(spark):
    corpus = _docs(spark)
    bench = spark.createDataFrame(
        [(9, "the quick brown fox likes snow")], "doc_id long, text string"
    )
    kept = {r["doc_id"] for r in decontaminate(corpus, bench, "doc_id", "text", n=3).collect()}
    assert kept == {2, 4}
    # n larger than any shared run → nothing removed
    kept8 = {r["doc_id"] for r in decontaminate(corpus, bench, "doc_id", "text", n=8).collect()}
    assert kept8 == {1, 2, 3, 4}


def test_pack_next_fit_invariants(spark):
    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97 + 5).cast("long").alias("n_tok"),
    )
    packed = pack_next_fit(df, "doc_id", "n_tok", budget=150, group_span=64)
    rows = packed.collect()
    assert len(rows) == 300  # every doc assigned exactly once
    summary = bin_summary(packed, "n_tok").collect()
    for r in summary:
        # budget respected unless the bin is a single oversized doc
        assert r["bin_tokens"] <= 150 or r["n_docs"] == 1
    # deterministic under repartitioning
    again = pack_next_fit(df.repartition(11), "doc_id", "n_tok", budget=150, group_span=64)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_pack_next_fit_is_next_fit_in_id_order(spark):
    df = spark.createDataFrame(
        [(0, 60), (1, 60), (2, 60), (3, 200), (4, 10)],
        "doc_id long, n_tok long",
    )
    out = {r["doc_id"]: r["bin_id"] for r in pack_next_fit(df, "doc_id", "n_tok", budget=100, group_span=1024).collect()}
    # 60 | 60 | 60 | 200(oversized alone) | 10
    assert out[0] == 0 and out[1] == 1 and out[2] == 2
    assert out[3] == 3 and out[4] == 4


def test_pack_groups_are_independent(spark):
    """Bin ids never collide across id-range groups and each group's
    packing ignores the others (the parallelism contract)."""
    df = spark.range(128).select(
        F.col("id").alias("doc_id"), F.lit(40).cast("long").alias("n_tok")
    )
    packed = pack_next_fit(df, "doc_id", "n_tok", budget=100, group_span=64)
    by_grp = {}
    for r in packed.collect():
        by_grp.setdefault(r["doc_id"] // 64, set()).add(r["bin_id"])
    assert not (by_grp[0] & by_grp[1])
    # group 1's local bins restart: 64 docs of 40 tokens, 2 per bin → 32 bins
    assert len(by_grp[0]) == 32 and len(by_grp[1]) == 32


def test_balance_sample_equalizes_strata(spark):
    from rabbit_in_a_blender_spark.ext.sampling import balance_sample

    # stratum a: 4000 rows of weight 10; b: 1000 rows; c: 500 rows (the min)
    df = spark.range(5500).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 4000, "a")
        .when(F.col("id") < 5000, "b")
        .otherwise("c")
        .alias("g"),
        F.lit(10).cast("long").alias("wt"),
    )
    out = balance_sample(df, "k", "g", "wt")
    totals = {
        r["g"]: r["t"]
        for r in out.groupBy("g").agg(F.sum("wt").alias("t")).collect()
    }
    # c (the smallest) kept whole; a and b down-sampled toward c's 5000
    assert totals["c"] == 5000
    assert 4000 < totals["a"] < 6000
    assert 4000 < totals["b"] < 6000
    # deterministic under repartitioning
    again = balance_sample(df.repartition(13), "k", "g", "wt")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_contamination_gram_df_cap_drops_boilerplate(spark):
    """A gram shared by many corpus docs is excluded once it exceeds the
    df cap; rare grams keep matching."""
    corpus = spark.createDataFrame(
        [
            (1, "all rights reserved worldwide x1 y1 z1"),
            (2, "all rights reserved worldwide x2 y2 z2"),
            (3, "all rights reserved worldwide x3 y3 z3"),
            (4, "one unique secret sauce phrase here ok"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "all rights reserved worldwide and one unique secret sauce phrase")],
        "doc_id long, text string",
    )
    uncapped = {
        r["doc_id"]
        for r in contamination_overlap(corpus, bench, "doc_id", "text", n=3).collect()
    }
    assert uncapped == {1, 2, 3, 4}
    capped = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in contamination_overlap(
            corpus, bench, "doc_id", "text", n=3, max_gram_df=2
        ).collect()
    }
    # the boilerplate grams hit 3 docs each → dropped; only doc 4's rare
    # grams survive
    assert set(capped) == {4}
