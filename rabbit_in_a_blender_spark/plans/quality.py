"""DQD-check and Achilles-statistics queries (SURVEY §2.K, G5/G6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_tables
from ..quality.checks import fk_orphans, plausible_value_low, start_before_end
from .catalog import register


# plausibleValueLow on lineitem quantity
@register(
    "dq_plausible_value_low",
    oracle="""
    SELECT 'plausibleValueLow_l_quantity' AS check_name,
           CAST(SUM(CASE WHEN l_quantity IS NOT NULL AND l_quantity < 5
                         THEN 1 ELSE 0 END) AS BIGINT) AS num_violated_rows,
           ROUND(SUM(CASE WHEN l_quantity IS NOT NULL AND l_quantity < 5
                          THEN 1 ELSE 0 END)
                 / greatest(COUNT(*), 1), 6) AS pct_violated_rows,
           CAST(COUNT(*) AS BIGINT) AS num_denominator_rows
    FROM lineitem
    """,
)
def dq_plausible_value_low(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return plausible_value_low(li, "l_quantity", 5)


# isForeignKey: events.user_id → supplier.s_suppkey (orphans exist: 100-149)
@register(
    "dq_fk_orphans",
    oracle="""
    SELECT 'isForeignKey_user_id' AS check_name,
           CAST(SUM(CASE WHEN e.user_id IS NOT NULL AND s.s_suppkey IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS num_violated_rows,
           ROUND(SUM(CASE WHEN e.user_id IS NOT NULL AND s.s_suppkey IS NULL
                          THEN 1 ELSE 0 END)
                 / greatest(COUNT(*), 1), 6) AS pct_violated_rows,
           CAST(COUNT(*) AS BIGINT) AS num_denominator_rows
    FROM events e
    LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
      ON e.user_id = s.s_suppkey
    """,
)
def dq_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "events", "supplier")
    return fk_orphans(t["events"], "user_id", t["supplier"], "s_suppkey", "isForeignKey_user_id")


# plausibleStartBeforeEnd: o_orderdate (start) vs l_shipdate (end), joined
@register(
    "dq_start_before_end",
    oracle="""
    SELECT 'plausibleStartBeforeEnd_o_orderdate_l_shipdate' AS check_name,
           CAST(SUM(CASE WHEN o_orderdate IS NOT NULL AND l_shipdate IS NOT NULL
                              AND l_shipdate < o_orderdate
                         THEN 1 ELSE 0 END) AS BIGINT) AS num_violated_rows,
           ROUND(SUM(CASE WHEN o_orderdate IS NOT NULL AND l_shipdate IS NOT NULL
                               AND l_shipdate < o_orderdate
                          THEN 1 ELSE 0 END)
                 / greatest(COUNT(*), 1), 6) AS pct_violated_rows,
           CAST(COUNT(*) AS BIGINT) AS num_denominator_rows
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def dq_start_before_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    joined = t["lineitem"].join(
        t["orders"], F.col("l_orderkey") == F.col("o_orderkey")
    )
    return start_before_end(
        joined,
        "o_orderdate",
        "l_shipdate",
        "plausibleStartBeforeEnd_o_orderdate_l_shipdate",
    )


# Achilles-style stratified counts → achilles_results shape
# (analysis_id, stratum_1, stratum_2, count_value; etl/achilles.py:507-561)
@register(
    "achilles_strata_counts",
    oracle="""
    SELECT 101 AS analysis_id,
           CAST(year(o_orderdate) AS VARCHAR) AS stratum_1,
           o_orderstatus                      AS stratum_2,
           CAST(COUNT(*) AS BIGINT)           AS count_value
    FROM orders
    GROUP BY year(o_orderdate), o_orderstatus
    """,
)
def achilles_strata_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return o.groupBy(
        F.year("o_orderdate").cast("string").alias("stratum_1"),
        F.col("o_orderstatus").alias("stratum_2"),
    ).agg(F.count(F.lit(1)).alias("count_value")).select(
        F.lit(101).alias("analysis_id"), "stratum_1", "stratum_2", "count_value"
    )
