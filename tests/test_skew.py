"""Skew helpers: salted aggregation/join equivalence to the plain ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from rabbit_in_a_blender_spark.operators.skew import (
    explain_shuffle_count,
    salted_agg,
    salted_broadcast_left,
)


def _skewed(spark):
    # key "hot" carries 90% of rows
    rows = [(i, "hot" if i % 10 else "cold", float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, "id int, k string, v double")


def test_salted_sum_matches_plain(spark):
    df = _skewed(spark)
    plain = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    out = salted_agg(df, ["k"], {"v": "sum"}, "id", salts=8)
    got = {r["k"]: r["sum_v"] for r in out.collect()}
    assert {k: round(v, 6) for k, v in got.items()} == {
        k: round(v, 6) for k, v in plain.items()
    }


def test_salted_count_and_max_match_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["n"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    got_n = {r["k"]: r["count_id"] for r in salted_agg(df, ["k"], {"id": "count"}, "id").collect()}
    got_mx = {r["k"]: r["max_v"] for r in salted_agg(df, ["k"], {"v": "max"}, "id").collect()}
    assert got_n == {k: v[0] for k, v in plain.items()}
    assert got_mx == {k: v[1] for k, v in plain.items()}


def test_salted_broadcast_left_matches_plain(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame([("hot", "H"), ("cold", "C")], "k string, label string")
    plain = {r["id"]: r["label"] for r in fact.join(dim, "k", "left").collect()}
    salted = {r["id"]: r["label"] for r in salted_broadcast_left(fact, dim, "k", "id").collect()}
    assert salted == plain


def test_explain_shuffle_count_smoke(spark):
    df = _skewed(spark).groupBy("k").count()
    assert explain_shuffle_count(df) >= 1
