"""Continuous-session soak test (VERDICT r7 task 9): the cache-release
contract (core/caching.py) has unit tests per operator; this proves the
long-loop property a continuous-crawl pipeline actually depends on —
100 increments of incremental_dedup + assign_ids + connected_components
in ONE session, with the LSH band index persisted to parquet between
increments exactly like streaming/sink.py does, and getPersistentRDDs
returning to BASELINE after every iteration (zero cache-entry or
checkpoint-pin accumulation across the whole loop)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from rabbit_in_a_blender_spark.core.caching import unpersist_intermediates
from rabbit_in_a_blender_spark.ext.cluster import connected_components
from rabbit_in_a_blender_spark.ext.dedup import incremental_dedup
from rabbit_in_a_blender_spark.operators.sequence import assign_ids


@pytest.mark.slow
def test_soak_100_increments_release_all_caches(spark):
    sc = spark.sparkContext
    baseline = len(sc._jsc.getPersistentRDDs())
    root = tempfile.mkdtemp(prefix="riab_soak_")
    index_dir = os.path.join(root, "bands")
    total_clean = 0
    try:
        for it in range(100):
            # 3 docs per increment: two unique (every word carries the
            # iteration id, so no shingle is shared across increments),
            # plus (every 4th round) an exact copy of the PREVIOUS
            # increment's first doc so the corpus screen actually fires
            # against the persisted index
            def _doc(i: int, stem: str) -> str:
                return " ".join(f"{stem}{i}w{j}" for j in range(8))

            rows = [
                (it * 10 + 1, _doc(it, "alpha")),
                (it * 10 + 2, _doc(it, "omega")),
            ]
            if it % 4 == 3:
                rows.append((it * 10 + 3, _doc(it - 1, "alpha")))
            batch = spark.createDataFrame(rows, "doc_id long, text string")
            corpus_bands = (
                spark.read.parquet(index_dir) if it > 0 else None
            )
            clean, bands = incremental_dedup(batch, corpus_bands, "doc_id", "text")
            seq = assign_ids(clean, ["doc_id"], offset=total_clean)
            n_clean = seq.count()
            total_clean += n_clean
            if it % 4 == 3:
                assert n_clean == 2, (it, n_clean)  # the near-dup was screened
            pairs = spark.createDataFrame(
                [(it, it + 1), (it + 1, it + 2)], "id_a long, id_b long"
            )
            comp = connected_components(pairs)
            assert comp.count() == 3
            # persist the surviving bands like the streaming sink does —
            # corpus state lives on disk, never as a pinned RDD
            bands.write.mode("append").parquet(index_dir)
            unpersist_intermediates(clean, bands, comp, seq)
            now = len(sc._jsc.getPersistentRDDs())
            assert now == baseline, (it, now, baseline)
        assert total_clean == 200  # 2 unique docs per increment survived
    finally:
        shutil.rmtree(root, ignore_errors=True)


@pytest.mark.slow
def test_soak_50_dsir_increments_release_all_caches(spark):
    """The DSIR counterpart: 50 incremental_dsir_weights increments in
    ONE session with the bucket model persisted to parquet between
    increments (compacted every 16th) — zero cache accumulation, and
    the model's gram mass tracks the full history exactly."""
    from pyspark.sql import functions as F

    from rabbit_in_a_blender_spark.ext.dsir import (
        compact_model,
        dsir_model_counts,
        incremental_dsir_weights,
    )

    sc = spark.sparkContext
    baseline = len(sc._jsc.getPersistentRDDs())
    root = tempfile.mkdtemp(prefix="riab_soak_dsir_")
    model_dir = os.path.join(root, "model")
    target = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], "doc_id long, text string"
    )
    target_model = dsir_model_counts(target, "doc_id", "text", num_buckets=64)
    grams = 0
    try:
        for it in range(50):
            batch = spark.createDataFrame(
                [
                    (it * 10 + 1, f"alpha beta w{it}"),
                    (it * 10 + 2, f"spam{it} junk{it} noise{it}"),
                ],
                "doc_id long, text string",
            )
            grams += 2 * (2 * 3 - 1)  # two 3-word docs per increment
            raw_model = (
                spark.read.parquet(model_dir)
                if it > 0
                else spark.createDataFrame([], "bucket long, cnt long")
            )
            w, _updated = incremental_dsir_weights(
                batch, raw_model, target_model, "doc_id", "text", num_buckets=64
            )
            assert w.count() == 2
            dsir_model_counts(
                batch, "doc_id", "text", num_buckets=64
            ).write.mode("append").parquet(model_dir)
            unpersist_intermediates(w)
            if it % 16 == 15:
                compact_model(spark, model_dir)
            now = len(sc._jsc.getPersistentRDDs())
            assert now == baseline, (it, now, baseline)
        mass = spark.read.parquet(model_dir).agg(F.sum("cnt")).first()[0]
        assert mass == grams
    finally:
        shutil.rmtree(root, ignore_errors=True)
