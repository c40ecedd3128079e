"""IVF ANN: recall against brute force, partition pruning contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rabbit_in_a_blender_spark.ext.ivf import build_ivf_index, ivf_search
from rabbit_in_a_blender_spark.ext.similarity import cosine_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_ivf_recall_vs_brute_force(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 10)
    exact = cosine_topk(embeddings, queries, k=3)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    centroids = embeddings.filter(F.col("vec_id") < 16)
    index = build_ivf_index(embeddings, centroids)
    approx = ivf_search(index, centroids, queries, k=3, nprobe=8)
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}

    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_index_assigns_every_vector_once(spark, embeddings):
    centroids = embeddings.filter(F.col("vec_id") < 16)
    index = build_ivf_index(embeddings, centroids)
    assert index.count() == embeddings.count()
    assert index.select("centroid_id").distinct().count() <= 16


def test_refine_centroids_shape_and_search(spark):
    from rabbit_in_a_blender_spark.core.io import load_tables
    from rabbit_in_a_blender_spark.ext.ivf import (
        build_ivf_index,
        ivf_search,
        refine_centroids,
    )

    e = load_tables(spark, "/root/testdata/sf0.001", "embeddings")["embeddings"]
    seed = e.filter("vec_id < 8")
    refined = refine_centroids(e, seed, iterations=1)
    rows = refined.collect()
    assert len(rows) == 8
    assert all(len(r["embedding"]) == 64 for r in rows)
    # refined centroids drive the same index/search path
    index = build_ivf_index(e, refined)
    out = ivf_search(index, refined, e.filter("vec_id < 3"), k=3, nprobe=3)
    got = out.collect()
    assert {r["query_id"] for r in got} == {0, 1, 2}
    assert all(len([x for x in got if x["query_id"] == q]) == 3 for q in (0, 1, 2))


def test_refine_centroids_grid_partitioning_invariant(spark):
    """grid rounding makes the Lloyd iteration reproducible across
    partitionings — the property the k-means hash oracle relies on."""
    import random

    from rabbit_in_a_blender_spark.ext.ivf import refine_centroids

    rng = random.Random(4)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    seeds = df.filter("vec_id < 3")

    def run(parts):
        out = refine_centroids(
            df.repartition(parts), seeds, iterations=3, grid=6
        ).collect()
        return sorted((r["vec_id"], tuple(r["embedding"])) for r in out)

    assert run(2) == run(11)


def test_assign_top_centroids_rank1_matches_build(spark):
    """Rank 1 of the multi-assignment IS build_ivf_index's assignment
    (same rounded-cosine/min-cid comparator); ranks are ordered by
    cosine descending; p caps at C."""
    import random

    from rabbit_in_a_blender_spark.ext.ivf import (
        assign_top_centroids,
        build_ivf_index,
    )

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(6)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = df.filter("vec_id < 4")

    top = assign_top_centroids(df, cents, p=2).collect()
    by_vec = {}
    for r in top:
        by_vec.setdefault(r["vec_id"], {})[r["centroid_rank"]] = r["centroid_id"]
    base = {
        r["vec_id"]: r["centroid_id"]
        for r in build_ivf_index(df, cents).select("vec_id", "centroid_id").collect()
    }
    assert len(by_vec) == 50
    for vid, ranks in by_vec.items():
        assert set(ranks) == {1, 2}
        assert ranks[1] == base[vid]
        assert ranks[1] != ranks[2]
    # p > C yields exactly C rows per vector
    capped = assign_top_centroids(df.limit(3), cents, p=9).collect()
    per = {}
    for r in capped:
        per.setdefault(r["vec_id"], set()).add(r["centroid_rank"])
    assert all(v == {1, 2, 3, 4} for v in per.values())


def test_build_ivf_index_arrow_matches_expr(spark):
    """The BLAS assignment twin must pick IDENTICAL centroids to the
    expr (HOF fold) path: both compare rounded cosines (1e-6 grid,
    HALF_UP) and break ties to the smaller centroid id.  Includes an
    exact-tie fixture (a vector equidistant from two centroids)."""
    import random

    from rabbit_in_a_blender_spark.ext.ivf import build_ivf_index

    rng = random.Random(13)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(200)]
    # exact rounded-cosine tie: equidistant from centroids 0 and 1
    rows.append((900, [1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 7), (1, [0.0, 1.0] + [0.0] * 6)]
        + [(c, [rng.gauss(0, 1) for _ in range(8)]) for c in range(2, 6)],
        "vec_id long, embedding array<double>",
    )
    # method="expr" explicitly — since r11 the DEFAULT is arrow, so a
    # bare call would compare arrow against itself
    expr = {
        r["vec_id"]: r["centroid_id"]
        for r in build_ivf_index(df, cents, method="expr")
        .select("vec_id", "centroid_id")
        .collect()
    }
    arrow = {
        r["vec_id"]: r["centroid_id"]
        for r in build_ivf_index(df, cents, method="arrow")
        .select("vec_id", "centroid_id")
        .collect()
    }
    assert arrow == expr
    assert expr[900] == 0  # tie broken to the smaller centroid id
    # the arrow path carries every corpus column through unchanged
    out = build_ivf_index(df, cents, method="arrow")
    assert set(out.columns) == {"vec_id", "embedding", "centroid_id"}
    # semantic_dedup(assign_method="arrow") flags identically
    from rabbit_in_a_blender_spark.core.caching import unpersist_intermediates
    from rabbit_in_a_blender_spark.ext.semdedup import semantic_dedup

    a = semantic_dedup(df, cents, tau=0.5, assign_method="expr")
    fa = {(r["vec_id"], r["centroid_id"], r["is_dup"]) for r in a.collect()}
    unpersist_intermediates(a)
    b = semantic_dedup(df, cents, tau=0.5, assign_method="arrow")
    fb = {(r["vec_id"], r["centroid_id"], r["is_dup"]) for r in b.collect()}
    unpersist_intermediates(b)
    assert fa == fb


def test_coarse_assignment_exhaustive_probe_equals_flat(spark):
    """The two-level quantizer with coarse_probe >= n_super probes every
    super-cell, so its candidate set is all C centroids and the
    assignment must be IDENTICAL to the flat arrow path (same 1e-6
    rounding grid + min-cid tie-break) — the unconditional-equality leg
    of the VERDICT r10 task-2 pin."""
    import random

    from rabbit_in_a_blender_spark.ext.ivf import build_ivf_index

    rng = random.Random(29)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(c, [rng.gauss(0, 1) for _ in range(8)]) for c in range(25)],
        "vec_id long, embedding array<double>",
    )
    flat = {
        r["vec_id"]: r["centroid_id"]
        for r in build_ivf_index(df, cents, method="arrow")
        .select("vec_id", "centroid_id").collect()
    }
    # n_super defaults to ceil(sqrt(25)) = 5; probe them all
    coarse = {
        r["vec_id"]: r["centroid_id"]
        for r in build_ivf_index(
            df, cents, method="coarse", coarse_probe=5
        ).select("vec_id", "centroid_id").collect()
    }
    assert coarse == flat


def test_coarse_assignment_separated_fixture_probe1(spark):
    """On well-separated clusters (orthogonal axes), probe=1 already
    finds the true nearest centroid: the super-cell containing it is
    the vector's nearest super-cell.  Also pins determinism (two runs,
    identical assignments) — the driver-side super-k-means has no RNG."""
    import random

    from rabbit_in_a_blender_spark.ext.ivf import build_ivf_index

    rng = random.Random(31)
    d = 16
    # 8 orthogonal-axis clusters, 30 points each, tiny jitter
    rows, cents_rows = [], []
    for c in range(8):
        axis = [0.0] * d
        axis[c] = 1.0
        cents_rows.append((c, axis))
        for i in range(30):
            v = [rng.gauss(0, 0.01) for _ in range(d)]
            v[c] += 1.0
            rows.append((c * 100 + i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        cents_rows, "vec_id long, embedding array<double>"
    )
    flat = {
        r["vec_id"]: r["centroid_id"]
        for r in build_ivf_index(df, cents, method="arrow")
        .select("vec_id", "centroid_id").collect()
    }
    runs = []
    for _ in range(2):
        runs.append({
            r["vec_id"]: r["centroid_id"]
            for r in build_ivf_index(
                df, cents, method="coarse", coarse_probe=1
            ).select("vec_id", "centroid_id").collect()
        })
    assert runs[0] == flat  # every point lands on its own axis centroid
    assert runs[0] == runs[1]  # deterministic
    assert all(v == k // 100 for k, v in runs[0].items())


def test_coarse_assignment_through_semantic_dedup(spark):
    """assign_method='coarse' threads through semantic_dedup and (with
    exhaustive probe at this C) flags the identical set as the arrow
    default — the integration leg of the task-2 pin."""
    import random

    from rabbit_in_a_blender_spark.core.caching import unpersist_intermediates
    from rabbit_in_a_blender_spark.ext.semdedup import semantic_dedup

    rng = random.Random(37)
    base = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(40)]
    rows = [(i, v) for i, v in enumerate(base)]
    rows += [(1000 + i, list(v)) for i, v in enumerate(base[:10])]  # dups
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(c, base[c]) for c in range(6)],
        "vec_id long, embedding array<double>",
    )
    a = semantic_dedup(df, cents, tau=0.9)
    fa = {(r["vec_id"], r["centroid_id"], r["is_dup"]) for r in a.collect()}
    unpersist_intermediates(a)
    b = semantic_dedup(df, cents, tau=0.9, assign_method="coarse")
    fb = {(r["vec_id"], r["centroid_id"], r["is_dup"]) for r in b.collect()}
    unpersist_intermediates(b)
    assert fa == fb
    assert any(f[2] for f in fb)  # the planted dups are flagged


def test_coarse_assignment_out_of_range_cid_falls_back(spark):
    """Centroid ids outside [0, 2^32) can't ride in the low 32 bits of
    the coarse path's running-best key — the method must fall back to
    the flat arrow path and still return correct assignments."""
    import random

    from rabbit_in_a_blender_spark.ext.ivf import build_ivf_index

    rng = random.Random(41)
    rows = [(i, [rng.gauss(0, 1) for _ in range(6)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    big = 1 << 33
    cents = spark.createDataFrame(
        [(big + c, [rng.gauss(0, 1) for _ in range(6)]) for c in range(9)],
        "vec_id long, embedding array<double>",
    )
    flat = {
        r["vec_id"]: r["centroid_id"]
        for r in build_ivf_index(df, cents, method="arrow")
        .select("vec_id", "centroid_id").collect()
    }
    coarse = {
        r["vec_id"]: r["centroid_id"]
        for r in build_ivf_index(df, cents, method="coarse")
        .select("vec_id", "centroid_id").collect()
    }
    assert coarse == flat
    assert all(v >= big for v in coarse.values())


def test_assign_top_centroids_arrow_matches_expr(spark):
    """The Arrow top-p twin must produce IDENTICAL (id, rank) ->
    centroid maps as the expr HOF sort — same rounded-cosine grid and
    min-cid tie-break — including at p > C and on a planted exact tie;
    out-of-range centroid ids fall back to expr transparently."""
    import random

    from rabbit_in_a_blender_spark.ext.ivf import assign_top_centroids

    rng = random.Random(43)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(150)]
    rows.append((900, [1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))  # tie
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 7), (1, [0.0, 1.0] + [0.0] * 6)]
        + [(c, [rng.gauss(0, 1) for _ in range(8)]) for c in range(2, 7)],
        "vec_id long, embedding array<double>",
    )

    def ranks(method, p):
        return {
            (r["vec_id"], r["centroid_rank"]): r["centroid_id"]
            for r in assign_top_centroids(df, cents, p=p, method=method)
            .collect()
        }

    for p in (1, 3, 9):  # 9 > C=7 exercises the cap
        assert ranks("arrow", p) == ranks("expr", p), f"p={p}"
    got = ranks("arrow", 2)
    assert got[(900, 1)] == 0 and got[(900, 2)] == 1  # tie to smaller cid
    # out-of-range ids: arrow delegates to expr, results still correct
    big = 1 << 33
    cents_big = cents.select(
        (F.col("vec_id") + big).alias("vec_id"), "embedding"
    )
    a = {
        (r["vec_id"], r["centroid_rank"]): r["centroid_id"]
        for r in assign_top_centroids(df, cents_big, p=2).collect()
    }
    e = {
        (r["vec_id"], r["centroid_rank"]): r["centroid_id"]
        for r in assign_top_centroids(df, cents_big, p=2, method="expr")
        .collect()
    }
    assert a == e and all(v >= big for v in a.values())


def test_assign_top_centroids_coarse_exhaustive_probe(spark):
    """Coarse top-p with exhaustive probe must reproduce the arrow/expr
    rank maps exactly (all candidates covered), including p > C and
    tie-breaks; with fewer probes on separated data, rank 1 still lands
    on the true nearest."""
    import random

    from rabbit_in_a_blender_spark.ext.ivf import assign_top_centroids

    rng = random.Random(47)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(c, [rng.gauss(0, 1) for _ in range(8)]) for c in range(16)],
        "vec_id long, embedding array<double>",
    )

    def ranks(method, p, **kw):
        return {
            (r["vec_id"], r["centroid_rank"]): r["centroid_id"]
            for r in assign_top_centroids(
                df, cents, p=p, method=method, **kw
            ).collect()
        }

    for p in (1, 3, 20):
        # n_super defaults to ceil(sqrt(16)) = 4; probe all 4 cells
        assert ranks("coarse", p, coarse_probe=4) == ranks("arrow", p), f"p={p}"


def test_resolve_assign_method_boundary():
    """Auto-escalation boundary (VERDICT r11 task 1): 'auto' rides the
    flat arrow rung strictly below AUTO_COARSE_MIN_C and the coarse
    O(N*sqrt(C)*d) rung at/above it; explicit methods never resolve."""
    from rabbit_in_a_blender_spark.ext.ivf import (
        AUTO_COARSE_MIN_C,
        resolve_assign_method,
    )

    assert resolve_assign_method("auto", AUTO_COARSE_MIN_C - 1) == "arrow"
    assert resolve_assign_method("auto", AUTO_COARSE_MIN_C) == "coarse"
    assert resolve_assign_method("auto", 10**9) == "coarse"
    # explicit methods pass through at any C
    assert resolve_assign_method("arrow", 10**9) == "arrow"
    assert resolve_assign_method("expr", 10**9) == "expr"
    assert resolve_assign_method("coarse", 1) == "coarse"
    # the threshold knob reads the module constant at call time
    assert resolve_assign_method("auto", 4, threshold=4) == "coarse"
    assert resolve_assign_method("auto", 4, threshold=5) == "arrow"


def test_auto_assignment_escalates_and_stays_exact(spark, monkeypatch, caplog):
    """method='auto' end to end: below the crossover it logs and picks
    the arrow rung; with the module threshold lowered to the fixture's C it
    logs the coarse rung — and both legs produce identical assignments
    (probe >= n_super makes coarse unconditional on this fixture)."""
    import logging
    import random

    import rabbit_in_a_blender_spark.ext.ivf as ivf

    rng = random.Random(12)
    df = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(c, [rng.gauss(0, 1) for _ in range(8)]) for c in range(16)],
        "vec_id long, embedding array<double>",
    )
    flat = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf.build_ivf_index(df, cents, method="arrow").collect()
    }
    caplog.set_level(logging.INFO, logger="riab_spark.ext.ivf")
    got = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf.build_ivf_index(df, cents, method="auto").collect()
    }
    assert got == flat
    assert any("auto -> 'arrow' (C=16" in m for m in caplog.messages)

    caplog.clear()
    monkeypatch.setattr(ivf, "AUTO_COARSE_MIN_C", 16)
    got = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf.build_ivf_index(
            df, cents, method="auto", coarse_probe=4
        ).collect()
    }
    assert got == flat
    assert any("auto -> 'coarse' (C=16" in m for m in caplog.messages)


def test_coarse_agreement_estimator_flags_adversarial_geometry(spark):
    """VERDICT r11 task 5: on uniform-random vectors vs random centroids
    (the r11 probe curve's worst case — agreement 0.68 at probe=4,
    C=400) the sampled estimator must FLAG low agreement at a small
    probe, and tune_coarse_probe must escalate until it reaches the
    target (exhaustive probing is exact by construction, so it always
    terminates)."""
    import random

    from rabbit_in_a_blender_spark.ext.ivf import (
        estimate_coarse_agreement,
        tune_coarse_probe,
    )

    rng = random.Random(7)
    df = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(400)],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(c, [rng.gauss(0, 1) for _ in range(16)]) for c in range(64)],
        "vec_id long, embedding array<double>",
    )
    # sample_mod=1: every row sampled (fixture-sized corpus)
    agree1, n1 = estimate_coarse_agreement(
        df, cents, coarse_probe=1, sample_mod=1
    )
    assert n1 == 400
    assert agree1 < 0.95, f"probe=1 agreement unexpectedly high: {agree1}"
    probe, agree = tune_coarse_probe(
        df, cents, target=0.98, start_probe=1, sample_mod=1
    )
    assert probe > 1
    assert agree >= 0.98
    # sanity: the estimator itself reports 1.0 at an exhaustive probe
    agree_all, _ = estimate_coarse_agreement(
        df, cents, coarse_probe=8, sample_mod=1
    )
    assert agree_all == 1.0


def test_probe_lists_degenerate_centroid_sorts_last(spark):
    """ADVICE r11: a centroid whose vector has null elements gets a
    null cosine; it must sort BELOW every real centroid (coalesced to
    -2.0) instead of consuming probe slots at the top of the
    array_sort+reverse order."""
    from rabbit_in_a_blender_spark.ext.ivf import probe_lists

    q = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [None, 1.0]),  # degenerate: null element -> null cosine
        ],
        "vec_id long, embedding array<double>",
    )
    got = [
        r["centroid_id"]
        for r in probe_lists(cents, q, nprobe=2).collect()
    ]
    assert sorted(got) == [1, 2]  # the degenerate centroid never probes
    # with nprobe covering all, it comes LAST
    all3 = probe_lists(cents, q, nprobe=3).collect()
    assert len(all3) == 3 and {r["centroid_id"] for r in all3} == {1, 2, 3}


def test_probe_lists_arrow_matches_expr(spark):
    """The r12 Arrow probe twin must select the IDENTICAL probed cells
    (same rounded-cosine desc / min-cid comparator, tie included) and
    carry the query vector through for the in-list exact scoring."""
    import random

    from rabbit_in_a_blender_spark.ext.ivf import probe_lists

    rng = random.Random(31)
    q = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(40)]
        + [(900, [1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 7), (1, [0.0, 1.0] + [0.0] * 6)]
        + [(c, [rng.gauss(0, 1) for _ in range(8)]) for c in range(2, 12)],
        "vec_id long, embedding array<double>",
    )

    def cells(method):
        out = probe_lists(cents, q, nprobe=3, method=method)
        assert set(out.columns) == {"query_id", "__qv", "centroid_id"}
        return {
            (r["query_id"], r["centroid_id"], tuple(r["__qv"]))
            for r in out.collect()
        }

    assert cells("arrow") == cells("expr")


def test_resolve_probe_method_boundary_and_auto_parity(spark):
    """r13 (VERDICT r12 task 6): the probe-side auto dispatch resolves
    by |Q|*C — expr (the oracle path) below AUTO_PROBE_MIN_QC, arrow
    from it up — and an auto probe returns the identical cells."""
    from rabbit_in_a_blender_spark.ext.ivf import (
        AUTO_PROBE_MIN_QC,
        probe_lists,
        resolve_probe_method,
    )

    t = AUTO_PROBE_MIN_QC
    assert resolve_probe_method("auto", 1, t - 1) == "expr"
    assert resolve_probe_method("auto", 1, t) == "arrow"
    assert resolve_probe_method("auto", t, 1) == "arrow"
    assert resolve_probe_method("auto", 1000, 1000) == "arrow"
    assert resolve_probe_method("auto", 999, 1000) == "expr"
    # explicit rungs pass through untouched at any size
    assert resolve_probe_method("expr", 10**9, 10**9) == "expr"
    assert resolve_probe_method("arrow", 1, 1) == "arrow"

    q = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, 0.5]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(c, [float(c), 1.0, 0.0]) for c in range(6)],
        "vec_id long, embedding array<double>",
    )

    def cells(method):
        return {
            (r["query_id"], r["centroid_id"])
            for r in probe_lists(cents, q, nprobe=2, method=method).collect()
        }

    assert cells("auto") == cells("expr") == cells("arrow")


def test_auto_escalation_emits_runtime_warning():
    """ADVICE r12 item 5: auto->coarse escalation is a VISIBLE
    RuntimeWarning (the exactness trade is geometry-dependent), while
    the sub-threshold resolution and explicit methods stay silent."""
    import warnings

    from rabbit_in_a_blender_spark.ext.ivf import (
        AUTO_COARSE_MIN_C,
        resolve_assign_method,
    )

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert resolve_assign_method("auto", AUTO_COARSE_MIN_C) == "coarse"
    assert any(
        isinstance(w.message, RuntimeWarning)
        and "escalated to 'coarse'" in str(w.message)
        for w in rec
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert resolve_assign_method("auto", AUTO_COARSE_MIN_C - 1) == "arrow"
        assert resolve_assign_method("coarse", AUTO_COARSE_MIN_C) == "coarse"
    assert not rec


def test_row_tiling_preserves_assignments(spark, monkeypatch):
    """r13 optimization: the numpy kernels slice each Arrow batch into
    bounded-scratch row tiles (ivf._row_tiles).  Every kernel is
    row-independent, so forcing MANY tiny tiles (ceiling lowered to a
    few rows x C elements) must change nothing — flat arrow, coarse,
    and the probe-side top-p all produce identical rows to the expr
    oracle twins."""
    import random

    import rabbit_in_a_blender_spark.ext.ivf as ivf

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(150)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(c, [rng.gauss(0, 1) for _ in range(8)]) for c in range(12)],
        "vec_id long, embedding array<double>",
    )

    def assignments(method):
        return {
            (r["vec_id"], r["centroid_id"])
            for r in ivf.build_ivf_index(df, cents, method=method)
            .select("vec_id", "centroid_id")
            .collect()
        }

    def probed(method):
        return {
            (r["vec_id"], r["centroid_id"], r["centroid_rank"])
            for r in ivf.assign_top_centroids(
                df, cents, p=3, method=method
            ).collect()
        }

    expr_assign = assignments("expr")
    expr_top = probed("expr")
    # ~5 rows per tile at C=12 -> every 150-row batch splits into many
    monkeypatch.setattr(ivf, "_TILE_ELEMS", 64)
    assert assignments("arrow") == expr_assign
    assert probed("arrow") == expr_top
    # exhaustive probe makes coarse exact on any geometry
    coarse = {
        (r["vec_id"], r["centroid_id"])
        for r in ivf._build_ivf_index_coarse(
            df, cents, "vec_id", "embedding", n_super=3, coarse_probe=3
        ).collect()
    }
    assert coarse == expr_assign


def test_fan_out_gate_rides_the_coarse_boundary(spark, tmp_path):
    """r13 optimization: the scan fan-out inside the ivf numpy kernels
    fires ONLY at C >= AUTO_COARSE_MIN_C (per-row work ~C*d dominates
    the exchange); below it the frame passes through UNTOUCHED so the
    fused small-C pipelines (IVFPQ C=16, SemDeDup clusters) keep their
    zero-shuffle plans — the measured 5-round A/B regression gate."""
    import rabbit_in_a_blender_spark.ext.ivf as ivf

    spark.range(40).selectExpr(
        "id as vec_id", "array(cast(id as double), 1.0d) as embedding"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "one"))
    df = spark.read.parquet(str(tmp_path / "one"))
    assert len(df.inputFiles()) == 1

    # below the boundary: identity (not just an equal plan — the same
    # object, so no exchange can have been inserted)
    assert ivf._fan_out_if_heavy(df, ivf.AUTO_COARSE_MIN_C - 1, "vec_id") is df
    # at/above: the single-file scan fans out to the session parallelism
    fanned = ivf._fan_out_if_heavy(df, ivf.AUTO_COARSE_MIN_C, "vec_id")
    assert fanned is not df
    assert "Exchange" in fanned._jdf.queryExecution().executedPlan().toString()
