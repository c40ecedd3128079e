"""DSIR importance resampling (ext/dsir.py).

Pins: the direction of the weights (target-like docs score higher), the
exact-integer determinism contract (partitioning invariance), the
Gumbel top-k selection properties (size, determinism, weight bias), and
the one-word-document bigram edge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rabbit_in_a_blender_spark.core.caching import unpersist_intermediates
from rabbit_in_a_blender_spark.ext.dsir import (
    dsir_resample,
    dsir_select,
    dsir_weights,
    hashed_ngram_buckets,
)

# Two clearly separated token distributions: "science" docs (target-like)
# and "spam" docs.  Vocabulary overlap is zero so the planted direction
# is unambiguous.
_SCI = "quantum field theory predicts particle interactions with precision"
_SPAM = "buy cheap pills now click here free offer win prize"


def _corpus(spark, n_sci=20, n_spam=20):
    rows = []
    for i in range(n_sci):
        rows.append((i, f"{_SCI} variant {i}"))
    for j in range(n_spam):
        rows.append((1000 + j, f"{_SPAM} variant {j}"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_weights_favor_target_like_docs(spark):
    raw = _corpus(spark)
    target = spark.createDataFrame(
        [(9000 + i, _SCI) for i in range(5)], ["doc_id", "text"]
    )
    w = dsir_weights(raw, target, "doc_id", "text", num_buckets=128)
    rows = {r.doc_id: r.logw_micro for r in w.collect()}
    unpersist_intermediates(w)
    sci = [v for k, v in rows.items() if k < 1000]
    spam = [v for k, v in rows.items() if k >= 1000]
    assert len(rows) == 40
    assert min(sci) > max(spam), "every target-like doc must outweigh every spam doc"


def test_weights_partitioning_invariant(spark):
    raw = _corpus(spark)
    target = raw.filter(F.col("doc_id") < 1000)
    base = dsir_weights(raw, target, "doc_id", "text", num_buckets=64)
    got1 = sorted((r.doc_id, r.logw_micro) for r in base.collect())
    unpersist_intermediates(base)
    re = dsir_weights(
        raw.repartition(7), target.repartition(3), "doc_id", "text", num_buckets=64
    )
    got2 = sorted((r.doc_id, r.logw_micro) for r in re.collect())
    unpersist_intermediates(re)
    assert got1 == got2


def test_resample_is_deterministic_and_biased(spark):
    raw = _corpus(spark, n_sci=30, n_spam=30)
    target = spark.createDataFrame([(9000, _SCI)], ["doc_id", "text"])
    w = dsir_weights(raw, target, "doc_id", "text", num_buckets=128)
    sel1 = sorted(r.doc_id for r in dsir_resample(w, "doc_id", k=20).collect())
    sel2 = sorted(r.doc_id for r in dsir_resample(w, "doc_id", k=20).collect())
    unpersist_intermediates(w)
    assert sel1 == sel2
    assert len(sel1) == 20
    n_sci = sum(1 for d in sel1 if d < 1000)
    # With zero vocab overlap the softmax gap is enormous: the sample
    # must be essentially all target-like docs.
    assert n_sci >= 18


def test_select_end_to_end_k_bound_and_schema(spark):
    raw = _corpus(spark)
    target = raw.filter(F.col("doc_id") < 1000)
    out = dsir_select(raw, target, "doc_id", "text", k=7, num_buckets=64)
    rows = out.collect()
    unpersist_intermediates(out)
    assert len(rows) == 7
    assert set(out.columns) == {"doc_id", "logw_micro", "key_micro"}


def test_one_word_doc_has_no_bigram(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "two words")], ["doc_id", "text"])
    counts = hashed_ngram_buckets(df, "doc_id", "text", num_buckets=1024)
    per_doc = {
        r.doc_id: r.total
        for r in counts.groupBy("doc_id").agg(F.sum("cnt").alias("total")).collect()
    }
    assert per_doc[1] == 1  # one unigram, zero bigrams
    assert per_doc[2] == 3  # two unigrams + one bigram


def test_incremental_equals_full_batch_for_delta_docs(spark):
    """Folding the batch into the persisted raw model and scoring only
    the batch must equal a full-corpus dsir_weights run with the same
    frozen target — the O(delta) contract."""
    from rabbit_in_a_blender_spark.ext.dsir import (
        dsir_model_counts,
        incremental_dsir_weights,
    )

    corpus = _corpus(spark)
    batch1 = corpus.filter(F.col("doc_id") % 2 == 0)
    batch2 = corpus.filter(F.col("doc_id") % 2 == 1)
    target = spark.createDataFrame([(9000, _SCI)], ["doc_id", "text"])

    raw_model = dsir_model_counts(batch1, "doc_id", "text", num_buckets=64)
    target_model = dsir_model_counts(target, "doc_id", "text", num_buckets=64)
    inc_w, updated = incremental_dsir_weights(
        batch2, raw_model, target_model, "doc_id", "text", num_buckets=64
    )
    inc = {r.doc_id: r.logw_micro for r in inc_w.collect()}

    full_w = dsir_weights(corpus, target, "doc_id", "text", num_buckets=64)
    full = {r.doc_id: r.logw_micro for r in full_w.collect()}
    unpersist_intermediates(inc_w, full_w)
    assert inc == {k: v for k, v in full.items() if k % 2 == 1}

    # the updated model is the whole corpus's bucket aggregate
    whole = {
        (r.bucket, r.cnt)
        for r in dsir_model_counts(corpus, "doc_id", "text", num_buckets=64)
        .collect()
    }
    assert {(r.bucket, r.cnt) for r in updated.collect()} == whole


def test_compact_model_preserves_aggregate(spark, tmp_path):
    """Compaction folds the appended model files to <=B rows in one
    file without changing the bucket aggregate."""
    from pyspark.sql import functions as F

    from rabbit_in_a_blender_spark.ext.dsir import compact_model, dsir_model_counts

    model_dir = str(tmp_path / "model")
    c1 = _corpus(spark, n_sci=5, n_spam=5)
    c2 = _corpus(spark, n_sci=3, n_spam=3)
    dsir_model_counts(c1, "doc_id", "text", num_buckets=64).write.mode(
        "append"
    ).parquet(model_dir)
    dsir_model_counts(c2, "doc_id", "text", num_buckets=64).write.mode(
        "append"
    ).parquet(model_dir)
    before = {
        r.bucket: r.cnt
        for r in spark.read.parquet(model_dir)
        .groupBy("bucket").agg(F.sum("cnt").alias("cnt")).collect()
    }
    n = compact_model(spark, model_dir)
    after = {r.bucket: r.cnt for r in spark.read.parquet(model_dir).collect()}
    assert after == before
    assert n == len(before) <= 64


def test_resample_default_seed_matches_select(spark):
    """dsir_resample's default Gumbel seed equals dsir_select's derived
    seed ("dsir" + "-g"), so resampling a weights frame separately
    selects the identical set the end-to-end helper (and the oracle)
    would — ADVICE r10: the old "dsirg" default silently diverged."""
    raw = _corpus(spark)
    target = raw.filter(F.col("doc_id") < 1000)
    w = dsir_weights(raw, target, "doc_id", "text", num_buckets=64)
    via_resample = sorted(
        r.doc_id for r in dsir_resample(w, "doc_id", k=9).collect()
    )
    e2e = dsir_select(raw, target, "doc_id", "text", k=9, num_buckets=64)
    via_select = sorted(r.doc_id for r in e2e.collect())
    unpersist_intermediates(w, e2e)
    assert via_resample == via_select


def test_fold_model_increment_idempotent_across_compaction(spark, tmp_path):
    """At-least-once safety (ADVICE r10): re-folding a tag is a no-op —
    both before AND after a compaction erases the tag's file (the
    manifest carries the tags across) — so crash-replay can never
    double-count a batch in the raw model."""
    from rabbit_in_a_blender_spark.ext.dsir import (
        compact_model,
        dsir_model_counts,
        fold_model_increment,
    )

    model_dir = str(tmp_path / "model")
    c1 = _corpus(spark, n_sci=5, n_spam=5)
    c2 = _corpus(spark, n_sci=3, n_spam=3)
    m1 = dsir_model_counts(c1, "doc_id", "text", num_buckets=64)
    m2 = dsir_model_counts(c2, "doc_id", "text", num_buckets=64)

    assert fold_model_increment(spark, model_dir, m1, "b1") is True
    assert fold_model_increment(spark, model_dir, m2, "b2") is True
    mass = spark.read.parquet(model_dir).agg(F.sum("cnt")).first()[0]
    # replay before compaction: file-existence guard
    assert fold_model_increment(spark, model_dir, m1, "b1") is False
    assert (
        spark.read.parquet(model_dir).agg(F.sum("cnt")).first()[0] == mass
    )
    # compaction folds to one file but preserves the tags in _folded.json
    n = compact_model(spark, model_dir)
    assert n <= 64
    # replay after compaction: manifest guard
    assert fold_model_increment(spark, model_dir, m2, "b2") is False
    assert (
        spark.read.parquet(model_dir).agg(F.sum("cnt")).first()[0] == mass
    )
    # a genuinely new tag still folds
    assert fold_model_increment(spark, model_dir, m1, "b3") is True
    m1_mass = m1.agg(F.sum("cnt")).first()[0]
    assert (
        spark.read.parquet(model_dir).agg(F.sum("cnt")).first()[0]
        == mass + m1_mass
    )


def test_fold_legacy_tag_migration_skip(spark, tmp_path):
    """ADVICE r12 item 2: a batch folded under the pre-r12 path-digest
    tag must NOT re-fold under the new content-fingerprint tag
    (double-count), while a genuinely new tag still folds."""
    from rabbit_in_a_blender_spark.ext.dsir import fold_model_increment

    model_dir = str(tmp_path / "model")
    counts = spark.createDataFrame(
        [(0, 5), (1, 7)], "bucket long, cnt long"
    )
    legacy = "0123456789abcdef"  # the old sha256(abspath)[:16] tag
    assert fold_model_increment(spark, model_dir, counts, legacy) is True
    # post-upgrade re-run of the SAME unchanged batch: new content tag,
    # legacy passed as a skip tag -> no-op, no double count
    assert (
        fold_model_increment(
            spark, model_dir, counts, "newcontenttag111",
            also_skip_tags=(legacy,),
        )
        is False
    )
    total = (
        spark.read.parquet(model_dir)
        .groupBy()
        .sum("cnt")
        .first()[0]
    )
    assert total == 12  # folded exactly once
    # refreshed data at the same path: different content tag, same
    # legacy skip tag... but the legacy tag no longer matches a file?
    # it does (path unchanged) — so the USER passes --fold-tag; the
    # library contract is: a tag not in {tag, also_skip} folds.
    assert (
        fold_model_increment(
            spark, model_dir, counts, "explicituser0001",
            also_skip_tags=(),
        )
        is True
    )
