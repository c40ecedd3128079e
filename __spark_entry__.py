"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``rabbit_in_a_blender_spark`` package; the
query/oracle inventory is the plans catalog
(rabbit_in_a_blender_spark/plans/*.py), one entry per SURVEY.md §2
operator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: grouped pricing summary
    (scan → filter → project → groupBy/agg), the engine's spine."""
    from rabbit_in_a_blender_spark.plans.catalog import get

    return get("q1_pricing_summary").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from rabbit_in_a_blender_spark.plans.catalog import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    from rabbit_in_a_blender_spark.plans.catalog import all_oracles

    return all_oracles()
