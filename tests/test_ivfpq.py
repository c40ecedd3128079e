"""IVFADC (IVF partition pruning x PQ codes): index shape, recall vs
brute force at least matching the plain PQ-rerank gate, probe-bounded
candidate generation, and parquet partition pruning on centroid_id."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rabbit_in_a_blender_spark.ext.ivfpq import build_ivfpq_index, ivfpq_search
from rabbit_in_a_blender_spark.ext.pq import l2_normalize, train_pq_codebooks
from rabbit_in_a_blender_spark.ext.similarity import cosine_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return l2_normalize(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), "embedding"
    )


@pytest.fixture(scope="module")
def trained(embeddings):
    centroids = embeddings.filter(F.col("vec_id") < 16)
    books = train_pq_codebooks(embeddings, m=16, ksub=32, iterations=2)
    index = build_ivfpq_index(embeddings, centroids, books, m=16)
    return centroids, books, index


def test_index_shape(embeddings, trained):
    centroids, books, index = trained
    rows = index.collect()
    assert len(rows) == embeddings.count()
    cids = {r["centroid_id"] for r in rows}
    assert cids <= set(range(16))
    assert all(len(r["codes"]) == 16 for r in rows)


def test_ivfpq_recall_vs_brute_force(embeddings, trained):
    centroids, books, index = trained
    queries = embeddings.filter(F.col("vec_id") < 10)
    exact_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(embeddings, queries, k=3).collect()
    }
    got = ivfpq_search(
        index, centroids, books, embeddings, queries,
        m=16, k=3, nprobe=8, shortlist=32,
    )
    pairs = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    recall = len(exact_pairs & pairs) / len(exact_pairs)
    # same gate as the plain PQ-rerank baseline (VERDICT r5 task 1)
    assert recall >= 0.8, f"IVFADC recall too low: {recall}"


def test_candidates_bounded_by_probed_cells(embeddings, trained):
    """The ADC scan must touch only probed cells' rows — count the code
    rows surviving the probe join and compare to the probed-cell sizes."""
    centroids, books, index = trained
    queries = embeddings.filter(F.col("vec_id") == 0)
    from rabbit_in_a_blender_spark.ext.ivf import probe_lists

    probes = probe_lists(centroids, queries, nprobe=2).select(
        "query_id", "centroid_id"
    )
    probed_cells = {r["centroid_id"] for r in probes.collect()}
    assert len(probed_cells) == 2
    cand = index.join(F.broadcast(probes), "centroid_id")
    expected = index.filter(F.col("centroid_id").isin(*probed_cells)).count()
    assert cand.count() == expected
    assert expected < index.count()  # pruning actually dropped cells


def test_partition_pruned_parquet_scan(spark, embeddings, trained, tmp_path):
    """Persisted shape: partitionBy(centroid_id) + a probe join must show
    partition filters in the scan (the 100 TB story: nprobe/C of the
    data read, not all of it) and search identically from disk."""
    centroids, books, index = trained
    index.write.partitionBy("centroid_id").parquet(f"{tmp_path}/ivfpq")
    reloaded = spark.read.parquet(f"{tmp_path}/ivfpq")
    queries = embeddings.filter(F.col("vec_id") < 3)
    direct = ivfpq_search(
        index, centroids, books, embeddings, queries, m=16, k=3, nprobe=8
    ).collect()
    from_disk = ivfpq_search(
        reloaded, centroids, books, embeddings, queries, m=16, k=3, nprobe=8
    ).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, from_disk))
    # a literal centroid_id filter on the partitioned layout prunes:
    plan = (
        reloaded.filter(F.col("centroid_id") == 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(centroid_id" in plan.replace("#", "#")


def test_residual_encoding_recall(spark, embeddings):
    """Classic IVFADC (residual encoding): codebooks trained on
    vec - centroid, search adds the exact dot(q, centroid) offset per
    probed cell. Same recall gate as the raw-vector path."""
    from rabbit_in_a_blender_spark.ext.ivfpq import train_residual_books

    centroids = embeddings.filter(F.col("vec_id") < 16)
    books = train_residual_books(
        embeddings, centroids, m=16, ksub=32, iterations=2
    )
    index = build_ivfpq_index(
        embeddings, centroids, books, m=16, residual=True
    )
    queries = embeddings.filter(F.col("vec_id") < 10)
    exact_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(embeddings, queries, k=3).collect()
    }
    got = ivfpq_search(
        index, centroids, books, embeddings, queries,
        m=16, k=3, nprobe=8, shortlist=32, residual=True,
    )
    pairs = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    recall = len(exact_pairs & pairs) / len(exact_pairs)
    assert recall >= 0.8, f"residual IVFADC recall too low: {recall}"


def test_residual_subtraction_is_exact(spark):
    """Unit: __resid = vec - centroid[assigned], via the broadcast map."""
    from rabbit_in_a_blender_spark.ext.ivf import build_ivf_index
    from rabbit_in_a_blender_spark.ext.ivfpq import _with_residuals

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (5, [0.9, 0.1]), (6, [0.2, 0.8])],
        "vec_id long, embedding array<double>",
    )
    centroids = df.filter(F.col("vec_id") < 2)
    assigned = build_ivf_index(df, centroids)
    out = {
        r["vec_id"]: (r["centroid_id"], r["__resid"])
        for r in _with_residuals(
            assigned, centroids, "vec_id", "embedding"
        ).collect()
    }
    assert out[5][0] == 0 and out[6][0] == 1
    assert out[5][1] == pytest.approx([-0.1, 0.1])
    assert out[6][1] == pytest.approx([0.2, -0.2])


def test_persisted_roundtrip_same_results(spark, embeddings, trained, tmp_path):
    """Searching the reloaded partitionBy(centroid_id) index returns
    EXACTLY the results of searching the in-memory index — persistence
    must be lossless including the code arrays (the catalog row
    ext_ivfpq_persisted runs this shape under the driver)."""
    centroids, books, index = trained
    path = f"{tmp_path}/ivfpq_rt"
    index.write.partitionBy("centroid_id").parquet(path)
    reloaded = spark.read.parquet(path)
    queries = embeddings.filter(F.col("vec_id") < 10)
    kw = dict(m=16, k=3, nprobe=8, shortlist=32)
    mem = ivfpq_search(index, centroids, books, embeddings, queries, **kw)
    disk = ivfpq_search(reloaded, centroids, books, embeddings, queries, **kw)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(disk) == key(mem) and disk.count() > 0


def test_incremental_append_equals_full_rebuild(spark, embeddings, trained, tmp_path):
    """VERDICT r10 task 5: with FROZEN centroids + codebooks, building
    the index on batch 1 and appending batch 2 must hold exactly the
    (id, centroid_id, codes) set of a single full build — encode(batch)
    is independent of previously indexed rows — and search over the
    appended layout returns identical results to search over a full
    rebuild.  The append plan reads only the batch (O(batch)); history
    is never listed, read, or rewritten."""
    from rabbit_in_a_blender_spark.ext.ivfpq import append_ivfpq_index

    centroids, books, _ = trained
    b1 = embeddings.filter(F.col("vec_id") % 2 == 0)
    b2 = embeddings.filter(F.col("vec_id") % 2 == 1)
    path = f"{tmp_path}/ivfpq_inc"
    build_ivfpq_index(b1, centroids, books, m=16).write.partitionBy(
        "centroid_id"
    ).parquet(path)
    append_ivfpq_index(b2, centroids, books, path, m=16)
    appended = spark.read.parquet(path)
    full = build_ivfpq_index(embeddings, centroids, books, m=16)
    key = lambda df: sorted(
        (r["vec_id"], r["centroid_id"], tuple(r["codes"]))
        for r in df.collect()
    )
    assert key(appended) == key(full)
    # search parity over the appended index vs the full in-memory build
    queries = embeddings.filter(F.col("vec_id") < 10)
    kw = dict(m=16, k=3, nprobe=8, shortlist=32)
    got_inc = ivfpq_search(appended, centroids, books, embeddings, queries, **kw)
    got_full = ivfpq_search(full, centroids, books, embeddings, queries, **kw)
    rows = lambda df: sorted(map(tuple, df.collect()))
    assert rows(got_inc) == rows(got_full) and got_inc.count() > 0


def test_incremental_append_residual_books(spark, embeddings, tmp_path):
    """The residual encoding path appends identically — residuals are
    (vec - frozen centroid), still independent of history."""
    from rabbit_in_a_blender_spark.ext.ivfpq import (
        append_ivfpq_index,
        train_residual_books,
    )

    centroids = embeddings.filter(F.col("vec_id") < 16)
    books = train_residual_books(embeddings, centroids, m=16, ksub=32)
    b1 = embeddings.filter(F.col("vec_id") < 1000)
    b2 = embeddings.filter(F.col("vec_id") >= 1000)
    path = f"{tmp_path}/ivfpq_inc_res"
    build_ivfpq_index(b1, centroids, books, m=16, residual=True) \
        .write.partitionBy("centroid_id").parquet(path)
    append_ivfpq_index(b2, centroids, books, path, m=16, residual=True)
    appended = spark.read.parquet(path)
    full = build_ivfpq_index(embeddings, centroids, books, m=16, residual=True)
    key = lambda df: sorted(
        (r["vec_id"], r["centroid_id"], tuple(r["codes"]))
        for r in df.collect()
    )
    assert key(appended) == key(full)


def test_ivfpq_search_arrow_matches_expr(spark, embeddings, trained):
    """The Arrow ADC scorer must return the same (query, neighbor,
    cosine) rows as the expr LUT fold — same rounded scores -> same
    shortlist -> same exact re-rank (VERDICT r11 task 4)."""
    centroids, books, index = trained
    queries = embeddings.filter(F.col("vec_id") < 6)

    def rows(method):
        out = ivfpq_search(
            index, centroids, books, embeddings, queries,
            m=16, k=3, nprobe=8, shortlist=16, method=method,
        )
        return sorted(
            (r["query_id"], r["neighbor_id"], r["cosine"])
            for r in out.collect()
        )

    assert rows("arrow") == rows("expr")


def test_ivfpq_search_arrow_matches_expr_residual(spark, embeddings):
    """Residual scoring adds the exact dot(q, centroid) term per probed
    cell; the Arrow twin's driver-side qc_dot must replay the expr
    join's fold order so the final double-rounded scores agree."""
    from rabbit_in_a_blender_spark.ext.ivfpq import train_residual_books

    centroids = embeddings.filter(F.col("vec_id") < 8)
    books = train_residual_books(embeddings, centroids, m=8, ksub=16)
    index = build_ivfpq_index(
        embeddings, centroids, books, m=8, residual=True
    )
    queries = embeddings.filter(F.col("vec_id") < 5)

    def rows(method):
        out = ivfpq_search(
            index, centroids, books, embeddings, queries,
            m=8, k=3, nprobe=4, shortlist=16, residual=True, method=method,
        )
        return sorted(
            (r["query_id"], r["neighbor_id"], r["cosine"])
            for r in out.collect()
        )

    assert rows("arrow") == rows("expr")


def test_missing_code_sorts_last_in_both_twins(spark, embeddings, trained):
    """ADVICE r12: a code absent from the codebook must yield NULL in
    BOTH scoring twins (expr element_at -> null; arrow LUT gather ->
    NaN converted to null), so the degenerate candidate sorts LAST
    under desc instead of NaN ranking first and eating shortlist
    slots.  Gates twin parity with a hole punched in the books AND
    with an out-of-range code id in the index."""
    centroids, books, index = trained
    queries = embeddings.filter(F.col("vec_id") < 4)
    # punch a hole: drop one (sub_idx, code) cell every index row uses
    holed = books.filter(
        ~((F.col("sub_idx") == 0) & (F.col("code") == 0))
    )
    # and corrupt one row's codes to an out-of-range id entirely
    victim = (
        index.orderBy("vec_id").limit(1).select("vec_id").first()["vec_id"]
    )
    corrupted = index.withColumn(
        "codes",
        F.when(
            F.col("vec_id") == victim,
            F.transform(F.col("codes"), lambda _: F.lit(999)),
        ).otherwise(F.col("codes")),
    )

    def rows(method):
        out = ivfpq_search(
            corrupted, centroids, holed, embeddings, queries,
            m=16, k=3, nprobe=8, shortlist=16, method=method,
        )
        return sorted(
            (r["query_id"], r["neighbor_id"], r["cosine"])
            for r in out.collect()
        )

    a, e = rows("arrow"), rows("expr")
    assert a == e
    # arrow scoring itself yields NULL (not NaN) for the corrupted row,
    # so desc ordering puts it last
    from rabbit_in_a_blender_spark.ext.ivfpq import _adc_scored_arrow
    from rabbit_in_a_blender_spark.ext.ivf import probe_lists

    probes = probe_lists(centroids, queries, nprobe=8)
    scored = _adc_scored_arrow(
        corrupted, probes, queries, holed, centroids,
        "vec_id", "embedding", 16, False,
    )
    vic = scored.filter(F.col("neighbor_id") == victim)
    assert vic.count() > 0
    assert vic.filter(F.col("score").isNotNull()).count() == 0
