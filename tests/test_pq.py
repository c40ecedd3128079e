"""Product quantization: codebook shapes, zero-information-loss check on
cluster-structured data, recall vs brute force, encode determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rabbit_in_a_blender_spark.ext.pq import (
    l2_normalize,
    pq_encode,
    pq_search,
    pq_search_rerank,
    train_pq_codebooks,
)
from rabbit_in_a_blender_spark.ext.similarity import cosine_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return l2_normalize(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), "embedding"
    )


def test_codebook_shape(spark, embeddings):
    books = train_pq_codebooks(embeddings, m=8, ksub=4, iterations=1)
    rows = books.collect()
    assert {r["sub_idx"] for r in rows} == set(range(8))
    for r in rows:
        assert 0 <= r["code"] < 4
        assert len(r["subvec"]) == 8  # 64 dims / 8 subspaces


def test_encode_every_vector_once_and_deterministic(spark, embeddings):
    books = train_pq_codebooks(embeddings, m=8, ksub=4, iterations=1)
    codes = pq_encode(embeddings, books, m=8)
    rows = codes.collect()
    assert len(rows) == embeddings.count()
    assert all(len(r["codes"]) == 8 for r in rows)
    again = pq_encode(embeddings.repartition(5), books, m=8).collect()
    assert sorted((r["vec_id"], tuple(r["codes"])) for r in rows) == sorted(
        (r["vec_id"], tuple(r["codes"])) for r in again
    )


def test_pq_exact_on_cluster_structured_vectors(spark):
    """When the data IS ksub distinct subvector patterns, PQ is lossless:
    ADC ranking must equal exact cosine ranking."""
    rows = []
    for i in range(16):
        vec = []
        for j in range(8):
            vec += [float(1 + (i + j) % 4)] * 8
        rows.append((i, vec))
    df = l2_normalize(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        "embedding",
    )
    books = train_pq_codebooks(df, m=8, ksub=4, iterations=2)
    codes = pq_encode(df, books, m=8)
    queries = df.filter(F.col("vec_id") < 4)
    approx = pq_search(codes, books, queries, m=8, k=3)
    exact = cosine_topk(df, queries, k=3)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    assert a == e


def test_pq_recall_vs_brute_force(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 10)
    exact_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(embeddings, queries, k=3).collect()
    }
    books = train_pq_codebooks(embeddings, m=16, ksub=32, iterations=2)
    codes = pq_encode(embeddings, books, m=16)
    # plain ADC: quantized ranking alone (unstructured fixture → modest)
    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_search(codes, books, queries, m=16, k=3).collect()
    }
    assert len(exact_pairs & adc) / len(exact_pairs) >= 0.2
    # ADC shortlist + exact re-rank: the production recipe
    rr = pq_search_rerank(
        codes, books, embeddings, queries, m=16, k=3, shortlist=32
    )
    rr_pairs = {(r["query_id"], r["neighbor_id"]) for r in rr.collect()}
    recall = len(exact_pairs & rr_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"PQ+rerank recall too low: {recall}"


def test_pq_search_survives_non_contiguous_codes(spark):
    """Regression (ADVICE r5 high): duplicate seed vectors make Lloyd
    drop an empty cluster, leaving code ids non-contiguous; the ADC LUT
    must key on code id, not position, or search throws / mis-scores."""
    rows = []
    for i in range(16):
        vec = []
        for j in range(4):
            vec += [float(1 + (i + j) % 4)] * 4
        rows.append((i, vec))
    rows[1] = (1, list(rows[0][1]))  # vec 1 duplicates vec 0 → empty cluster
    df = l2_normalize(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        "embedding",
    )
    books = train_pq_codebooks(df, m=4, ksub=4, iterations=2)
    per_sub = {}
    for r in books.collect():
        per_sub.setdefault(r["sub_idx"], []).append(r["code"])
    assert any(
        sorted(codes) != list(range(len(codes))) for codes in per_sub.values()
    ), "fixture no longer produces non-contiguous codes"
    codes = pq_encode(df, books, m=4)
    queries = df.filter(F.col("vec_id") == 0)
    got = pq_search(codes, books, queries, m=4, k=3).collect()
    assert len(got) == 3
    assert all(r["score"] is not None for r in got)
    # vec 1 is an exact duplicate of query 0: same codes → the maximal
    # ADC score, so it must lead the ranking
    assert got[0]["neighbor_id"] == 1 or got[0]["score"] == max(
        r["score"] for r in got
    )
    by_score = sorted(got, key=lambda r: (-r["score"], r["neighbor_id"]))
    assert by_score[0]["neighbor_id"] == 1


def test_pq_index_survives_parquet_roundtrip(spark, embeddings, tmp_path):
    """Write-time encode: codes + codebooks persisted to parquet and read
    back must search identically (the deploy shape — encode once at
    ingest, search from the compact index)."""
    books = train_pq_codebooks(embeddings, m=8, ksub=4, iterations=1)
    codes = pq_encode(embeddings, books, m=8)
    queries = embeddings.filter(F.col("vec_id") < 3)
    direct = pq_search(codes, books, queries, m=8, k=3).collect()
    books.write.parquet(f"{tmp_path}/books")
    codes.write.parquet(f"{tmp_path}/codes")
    b2 = spark.read.parquet(f"{tmp_path}/books")
    c2 = spark.read.parquet(f"{tmp_path}/codes")
    reloaded = pq_search(c2, b2, queries, m=8, k=3).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, reloaded))


def test_pq_encode_and_train_arrow_match_expr(spark, embeddings):
    """The r12 Arrow twins must be BIT-IDENTICAL to the expr paths:
    training assignments (same per-round nearest-code picks -> same
    grid-rounded codebooks) and encode codes (same left-to-right L2
    fold, 1e-9 HALF_UP grid, min-code tie-break) — the VERDICT r11
    task-4 pin for the corpus-sized IVFADC passes."""
    from rabbit_in_a_blender_spark.ext.pq import pq_encode, train_pq_codebooks

    be = train_pq_codebooks(
        embeddings, m=8, ksub=16, iterations=2, grid=6, assign_method="expr"
    )
    ba = train_pq_codebooks(
        embeddings, m=8, ksub=16, iterations=2, grid=6, assign_method="arrow"
    )
    rows_e = sorted(
        (r["sub_idx"], r["code"], tuple(r["subvec"])) for r in be.collect()
    )
    rows_a = sorted(
        (r["sub_idx"], r["code"], tuple(r["subvec"])) for r in ba.collect()
    )
    assert rows_e == rows_a
    enc_e = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode(embeddings, be, m=8, method="expr").collect()
    )
    enc_a = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode(embeddings, be, m=8, method="arrow").collect()
    )
    assert enc_e == enc_a
