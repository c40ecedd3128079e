"""Unit/property tests for ext/heavy.py (Misra-Gries heavy hitters)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from rabbit_in_a_blender_spark.core.caching import unpersist_intermediates
from rabbit_in_a_blender_spark.ext.heavy import heavy_hitters, mg_candidates


def _stream(spark, items, partitions=6):
    return spark.createDataFrame(
        [(x,) for x in items], "item string"
    ).repartition(partitions)


def _exact_hh(items, k):
    from collections import Counter

    n = len(items)
    return {x for x, c in Counter(items).items() if c * k > n}


def test_candidates_superset_property(spark):
    """Pigeonhole guarantee: union of per-partition MG survivors contains
    every item with global frequency > n/k — across random skews, seeds,
    and partitionings."""
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        # zipf-ish skew over 200 item ids + a couple of planted giants
        items = [f"i{min(int(rng.paretovariate(1.1)), 200)}" for _ in range(5000)]
        items += ["giant"] * 400 + ["minor"] * 120
        rng.shuffle(items)
        for k, parts in ((10, 4), (25, 8)):
            cand = {
                r["item"]
                for r in mg_candidates(_stream(spark, items, parts), "item", k).collect()
            }
            assert _exact_hh(items, k) <= cand, f"seed={seed} k={k} parts={parts}"


def test_heavy_hitters_exactly_match_full_groupby(spark):
    rng = random.Random(3)
    items = [f"w{rng.randint(0, 30)}" for _ in range(4000)] + ["hot"] * 500
    rng.shuffle(items)
    df = _stream(spark, items, 8)
    got = {(r["item"], r["freq"]) for r in heavy_hitters(df, "item", 20).collect()}
    exact = {
        (r["item"], r["cnt"])
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") * 20 > len(items))
        .collect()
    }
    assert got == exact and ("hot", 500) in got


def test_no_heavy_hitters_when_uniform(spark):
    # 100 equally-frequent items, k=50: nothing exceeds n/50
    items = [f"u{i}" for i in range(100)] * 10
    out = heavy_hitters(_stream(spark, items, 4), "item", 50).collect()
    assert out == []


def test_nulls_ignored_and_release_contract(spark):
    sc = spark.sparkContext
    items = ["a"] * 50 + ["b"] * 5
    df = spark.createDataFrame([(x,) for x in items] + [(None,)], "item string")
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    res = heavy_hitters(df, "item", 4)
    rows = res.collect()
    assert {(r["item"], r["freq"]) for r in rows} == {("a", 50)}  # null never counted
    unpersist_intermediates(res)
    after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    assert after <= before  # the pinned screen was released


def test_heavy_hitters_partitioning_independent(spark):
    """MG survivors vary with partitioning; the exact verify pass makes
    the FINAL answer invariant."""
    rng = random.Random(11)
    items = [f"t{rng.randint(0, 40)}" for _ in range(3000)] + ["big"] * 300
    rng.shuffle(items)
    outs = []
    for parts in (1, 3, 16):
        df = _stream(spark, items, parts)
        res = heavy_hitters(df, "item", 15)
        outs.append({(r["item"], r["freq"]) for r in res.collect()})
        unpersist_intermediates(res)
    assert outs[0] == outs[1] == outs[2]
    assert ("big", 300) in outs[0]
