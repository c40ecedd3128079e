"""Plan-shape regression tests: the scale properties PLANS.md documents,
asserted so a refactor can't silently regress them."""

from __future__ import annotations

import pytest

from rabbit_in_a_blender_spark.plans.catalog import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = all_queries()[name](spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_dim_lookup_join_broadcasts(spark):
    plan = _plan(spark, "j1_dim_lookup_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q1_single_shuffle_with_pushdown(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan


def test_q5_no_sort_merge_join(spark):
    # 5 dims broadcast; only the fact-fact shuffle(s) remain
    plan = _plan(spark, "q5_region_revenue")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastExchange") >= 3


def test_scalable_sequence_has_no_single_partition_window(spark):
    plan = _plan(spark, "seq_assign_scalable")
    # the strict variant funnels through Exchange SinglePartition + Window;
    # the scalable one must not
    assert "Exchange SinglePartition" not in plan


def test_minhash_lsh_never_cross_joins(spark):
    plan = _plan(spark, "ext_dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_text_ops_are_shuffle_free(spark):
    for name in ("ext_text_stats", "ext_token_count", "ext_quality_score", "ext_langid"):
        plan = _plan(spark, name)
        assert "Exchange hashpartitioning" not in plan, name


def test_sampling_and_split_are_shuffle_free(spark):
    for name in ("ext_sample_uniform", "ext_sample_stratified", "ext_split_assign"):
        plan = _plan(spark, name)
        assert "Exchange hashpartitioning" not in plan, name
        assert "Exchange SinglePartition" not in plan, name


def test_decontam_broadcasts_benchmark_grams(spark):
    plan = _plan(spark, "ext_decontam_filter")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_pack_nextfit_single_shuffle(spark):
    plan = _plan(spark, "ext_pack_nextfit")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_bpe_rows_codegen_with_at_most_the_fanout_exchange(spark):
    """The literal-replace chain and the vocab-id map must stay inside
    whole-stage codegen (PLANS.md r7 note).  Since the r13 optimization
    round the single-file scan MAY carry exactly one keyless
    round-robin fan-out exchange ahead of the merge chain (the §2.5
    serial-scan remedy — measured 0.225 A/B on ext_bpe_token_counts);
    hash exchanges, joins, or aggregates would still flag a regression."""
    import re

    for name in ("ext_bpe_token_counts", "ext_bpe_encode_ids"):
        plan = _plan(spark, name)
        exchanges = re.findall(r"Exchange (\w+)", plan)
        assert len(exchanges) <= 1, (name, exchanges)
        assert all(e == "RoundRobinPartitioning" for e in exchanges), (
            name,
            exchanges,
        )
        # the chain itself must stay a JVM expression projection: no
        # Python boundary, no join, no aggregate anywhere in the plan
        # (the fan-out wraps the plan in AdaptiveSparkPlan, which hides
        # the *(n) codegen markers until execution)
        for node in ("BatchEvalPython", "ArrowEvalPython", "Join", "Aggregate"):
            assert node not in plan, (name, node)
        assert "transform(" in plan, name  # the merge chain projection


def test_deterministic_shuffle_is_shuffle_free(spark):
    """The O(1) closed-form shard assignment must not change the
    zero-exchange narrow-projection shape."""
    plan = _plan(spark, "ext_deterministic_shuffle")
    assert "Exchange" not in plan


def test_dup_window_fraction_shuffles_digests_only(spark):
    """Two digest-keyed shuffles (window-df groupBy + join back + final
    id groupBy); the raw text column must not survive past the scan
    projection into any exchange."""
    plan = _plan(spark, "ext_dup_window_fraction")
    assert 2 <= plan.count("Exchange hashpartitioning") <= 3
    # every exchange is keyed on the md5 digest or the doc id
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^,]+),", plan):
        key = m.group(1)
        assert "__h" in key or "doc_id" in key, key


def test_ts_rollup_bounded_shuffles_spine_broadcast(spark):
    # 2 hash exchanges (rollup agg + LOCF window); the per-group spine
    # arrives by broadcast; never a cartesian
    plan = _plan(spark, "ext_ts_rollup_gapfill")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_regr_outliers_model_broadcasts(spark):
    # the |groups|-row model joins back by broadcast, not SMJ
    plan = _plan(spark, "ext_regr_outliers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_heavy_hitters_screen_is_narrow(spark):
    # the MG screen (mapInPandas) runs BEFORE any exchange: candidates are
    # produced without shuffling the token stream; the verify join
    # broadcasts the candidate set
    from rabbit_in_a_blender_spark.core.caching import unpersist_intermediates
    from rabbit_in_a_blender_spark.ext.heavy import heavy_hitters
    from rabbit_in_a_blender_spark.plans.catalog import all_queries

    df = all_queries()["ext_heavy_hitters"](spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    unpersist_intermediates(df)
    assert "BroadcastHashJoin" in plan
    # two hash exchanges only: the candidate distinct (over the
    # screen's ≤(k+1)×partitions rows, never the token stream) and the
    # exact re-count of the candidate-pruned stream
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "SortMergeJoin" not in plan


def test_psi_drift_edges_and_ref_broadcast(spark):
    plan = _plan(spark, "ext_psi_drift")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2  # edge array + ref shares
