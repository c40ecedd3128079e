"""PageRank: numpy cross-check, mass conservation, dangling handling,
cache release."""

from __future__ import annotations

import numpy as np

from rabbit_in_a_blender_spark.core.caching import unpersist_intermediates
from rabbit_in_a_blender_spark.ext.graph import pagerank


def _numpy_pagerank(edges, damping=0.85, iterations=5, round_decimals=8):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dm = r[out_deg == 0].sum()
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[idx[d]] += r[idx[s]] / out_deg[idx[s]]
        r = np.round((1 - damping) / n + damping * (contrib + dm / n),
                     round_decimals)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_reference(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"),  # d is a source only
        ("c", "e"),  # e is a sink (dangling)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = pagerank(df, iterations=5)
    got = {r["node"]: r["rank"] for r in out.collect()}
    unpersist_intermediates(out)
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v


def test_pagerank_mass_conserved_and_authority_ranks_highest(spark):
    # star: everyone points at 'hub'
    edges = [(f"u{i}", "hub") for i in range(8)]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = pagerank(df, iterations=10)
    rows = out.collect()
    unpersist_intermediates(out)
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-5
    best = max(rows, key=lambda r: r["rank"])
    assert best["node"] == "hub"


def test_pagerank_all_dangling_graph_stays_uniform(spark):
    # one edge a->b, then b dangles; with symmetric b->a the graph is a
    # 2-cycle and must stay exactly uniform.
    df = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    out = pagerank(df, iterations=7)
    got = {r["node"]: r["rank"] for r in out.collect()}
    unpersist_intermediates(out)
    assert got == {"a": 0.5, "b": 0.5}


def test_pagerank_releases_pinned_state(spark):
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    df = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    out = pagerank(df, iterations=2)
    out.collect()
    assert jsc.getPersistentRDDs().size() > before
    released = unpersist_intermediates(out)
    # final cache entry + final checkpoint pin
    assert released >= 2
    assert jsc.getPersistentRDDs().size() == before
