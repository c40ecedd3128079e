"""Aggregation operators (SURVEY §2.D) as DataFrame helpers."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sorted_string_agg(col: str, sep: str = ", ", max_len: int | None = None) -> Column:
    """Deterministic STRING_AGG (G3/W5).

    BigQuery's STRING_AGG order is unspecified (bq:etl/{omop_table}_merge
    .sql.jinja:54-63); we sort before concatenating so results are
    reproducible and oracle-comparable (SURVEY §7 known-hard #3).
    SQL Server truncates to 255 (ss:etl/{omop_table}_merge.sql.jinja:51)
    — pass max_len=255 for that behavior.
    """
    agg = F.array_join(F.array_sort(F.collect_list(F.col(col))), sep)
    if max_len is not None:
        agg = F.substring(agg, 1, max_len)
    return agg


def duplicate_groups(
    df: DataFrame,
    keys: Sequence[str],
    min_count: int = 2,
) -> DataFrame:
    """Duplicate detection (G1/B7): group on keys, keep groups with
    COUNT(*) >= min_count, counts descending.

    Reference: bq:etl/{omop_work_table}_merge_check_for_duplicate_rows
    .sql.jinja:3-63 (HAVING COUNT(*) > 1, ORDER BY cnt DESC).
    Map-side partial aggregation makes this one cheap shuffle of
    (keys, partial count) pairs even at 100 TB.
    """
    return (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") >= min_count)
        .orderBy(F.desc("dup_count"), *[F.col(k) for k in keys])
    )


def distribution_stats(
    df: DataFrame,
    value_col: str,
    strata: Sequence[str],
    quantiles: Sequence[float] = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Achilles-style distribution analysis (G6): avg/stddev + exact
    continuous quantiles per stratum.

    Reference shape: achilles_results_dist(avg_value, stdev_value,
    median_value, p10/p25/p75/p90_value) — etl/achilles.py:507-561.
    Exact ``percentile`` matches the DuckDB oracle (quantile_cont); at
    100 TB swap to ``percentile_approx`` behind ``approx=True`` at the
    call-site — same schema, bounded memory.
    """
    qcols = [
        F.percentile(F.col(value_col), F.lit(q)).alias(f"p{int(q * 100)}_value")
        for q in quantiles
    ]
    return df.groupBy(*[F.col(s) for s in strata]).agg(
        F.count(F.lit(1)).alias("count_value"),
        F.avg(value_col).alias("avg_value"),
        F.stddev_samp(value_col).alias("stdev_value"),
        *qcols,
    )
