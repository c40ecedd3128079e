"""Achilles-style descriptive statistics (SURVEY §2.D G6, §3.3).

The reference executes ~290 vendored analysis SQL files and UNION-ALLs
scratch results into achilles_results / achilles_results_dist
(etl/achilles.py:54-227, 507-561).  Here an analysis is a function
returning one of the two standard shapes; the runner enforces the shape,
unions (U4), and persists.

Standard shapes:
  results:      (analysis_id, stratum_1..5, count_value)
  results_dist: (analysis_id, stratum_1..5, count_value, avg_value,
                 stdev_value, median_value, p10/p25/p75/p90_value)
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.warehouse import Warehouse

RESULT_COLS = ["analysis_id", "stratum_1", "stratum_2", "stratum_3", "stratum_4", "stratum_5", "count_value"]
DIST_COLS = RESULT_COLS + [
    "avg_value",
    "stdev_value",
    "median_value",
    "p10_value",
    "p25_value",
    "p75_value",
    "p90_value",
]


def counts_analysis(
    df: DataFrame, analysis_id: int, strata: Sequence[str]
) -> DataFrame:
    """Stratified count in the achilles_results shape (≤5 strata)."""
    assert len(strata) <= 5
    sel = [
        F.col(s).cast("string").alias(f"stratum_{i + 1}")
        for i, s in enumerate(strata)
    ] + [
        F.lit(None).cast("string").alias(f"stratum_{i + 1}")
        for i in range(len(strata), 5)
    ]
    return (
        df.groupBy(*[F.col(s) for s in strata])
        .agg(F.count(F.lit(1)).cast("long").alias("count_value"))
        .select(F.lit(analysis_id).alias("analysis_id"), *sel, "count_value")
    )


def dist_analysis(
    df: DataFrame, analysis_id: int, value_col: str, strata: Sequence[str], approx: bool = False
) -> DataFrame:
    """Distribution analysis in the achilles_results_dist shape.

    ``approx=True`` switches exact percentiles to percentile_approx —
    same schema, bounded memory for 100 TB runs.
    """
    assert len(strata) <= 5
    pct = F.percentile_approx if approx else F.percentile
    sel = [
        F.col(s).cast("string").alias(f"stratum_{i + 1}")
        for i, s in enumerate(strata)
    ] + [
        F.lit(None).cast("string").alias(f"stratum_{i + 1}")
        for i in range(len(strata), 5)
    ]
    return (
        df.groupBy(*[F.col(s) for s in strata])
        .agg(
            F.count(F.lit(1)).cast("long").alias("count_value"),
            F.avg(value_col).alias("avg_value"),
            F.stddev_samp(value_col).alias("stdev_value"),
            pct(F.col(value_col), F.lit(0.5)).alias("median_value"),
            pct(F.col(value_col), F.lit(0.1)).alias("p10_value"),
            pct(F.col(value_col), F.lit(0.25)).alias("p25_value"),
            pct(F.col(value_col), F.lit(0.75)).alias("p75_value"),
            pct(F.col(value_col), F.lit(0.9)).alias("p90_value"),
        )
        .select(F.lit(analysis_id).alias("analysis_id"), *sel, "count_value",
                "avg_value", "stdev_value", "median_value",
                "p10_value", "p25_value", "p75_value", "p90_value")
    )


def grouped_counts_analyses(
    df: DataFrame, specs: Sequence[tuple[int, Sequence[str]]]
) -> DataFrame:
    """Every no-prepare stratified count of ONE table in a single
    GROUPING SETS aggregation: one scan + one shuffle regardless of how
    many analyses share the table (vs one scan+shuffle per analysis).

    Each input (analysis_id, strata) becomes one grouping set;
    ``grouping_id()`` identifies the set on the way out, and a when-chain
    projection rebuilds the exact ``counts_analysis`` row shape
    (analysis_id, stratum_1..5 cast to string, bigint count_value).
    Callers must pass strata whose column SETS are pairwise distinct —
    ``grouping_id`` depends only on which columns are grouped, so two
    analyses whose strata are permutations of each other would share a
    grouping id (first spec duplicated, second starved).  Strata must
    also be non-empty: a grouping-sets aggregation over an empty table
    emits no rows, whereas the grand-total ``counts_analysis`` path
    emits an explicit 0-count row (matching SELECT COUNT(*)), so
    ()-strata specs must stay on the per-spec path.
    """
    assert len({frozenset(s) for _, s in specs}) == len(specs), (
        "strata column-sets must be pairwise distinct (grouping_id "
        "ignores column order)"
    )
    assert all(s for _, s in specs), (
        "()-strata specs lose their empty-table zero row under "
        "grouping sets; run them via counts_analysis"
    )
    all_cols: list[str] = []
    for _, strata in specs:
        for c in strata:
            if c not in all_cols:
                all_cols.append(c)
    n = len(all_cols)

    def gid_of(strata: Sequence[str]) -> int:
        g = 0
        for i, c in enumerate(all_cols):
            if c not in strata:
                g |= 1 << (n - 1 - i)
        return g

    agged = df.groupingSets(
        [[F.col(c) for c in strata] for _, strata in specs],
        *[F.col(c) for c in all_cols],
    ).agg(
        F.count(F.lit(1)).cast("long").alias("count_value"),
        F.grouping_id().alias("__gid"),
    )

    def chain(value_for_spec) -> "F.Column":
        expr = None
        for aid, strata in specs:
            v = value_for_spec(aid, strata)
            cond = F.col("__gid") == gid_of(strata)
            expr = F.when(cond, v) if expr is None else expr.when(cond, v)
        return expr

    strata_cols = [
        chain(
            lambda aid, strata, _i=i: (
                F.col(strata[_i]).cast("string")
                if _i < len(strata)
                else F.lit(None).cast("string")
            )
        ).alias(f"stratum_{i + 1}")
        for i in range(5)
    ]
    return agged.select(
        chain(lambda aid, strata: F.lit(aid)).cast("int").alias("analysis_id"),
        *strata_cols,
        "count_value",
    )


def run_analyses(
    spark: SparkSession,
    warehouse: Warehouse | None,
    analyses: Mapping[int, Callable[[SparkSession], DataFrame]],
) -> dict[str, DataFrame]:
    """Run every analysis, split by shape, UNION ALL, persist (U4)."""
    counts, dists = [], []
    for aid, fn in sorted(analyses.items()):
        df = fn(spark)
        if set(df.columns) == set(DIST_COLS):
            dists.append(df.select(*DIST_COLS))
        elif set(df.columns) == set(RESULT_COLS):
            counts.append(df.select(*RESULT_COLS))
        else:
            raise ValueError(f"analysis {aid}: unexpected shape {df.columns}")
    out: dict[str, DataFrame] = {}
    if counts:
        merged = counts[0]
        for c in counts[1:]:
            merged = merged.unionByName(c)
        out["achilles_results"] = merged
    if dists:
        merged = dists[0]
        for d in dists[1:]:
            merged = merged.unionByName(d)
        out["achilles_results_dist"] = merged
    if warehouse is not None:
        for name, df in out.items():
            warehouse.write(df, "achilles", name)
    return out
