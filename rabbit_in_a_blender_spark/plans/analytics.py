"""Multi-join analytics suite (TPC-H-shaped) over the driver testdata.

These prove operator COMPOSITION at scale: star-schema joins with
broadcast dims, selective predicates that reach the parquet scan,
conditional aggregation, and threshold filters instead of LIMIT (top-N
with boundary ties is non-deterministic across engines).

Scale notes: every dim here (region/nation/customer/supplier/part) is
broadcast-sized relative to lineitem/orders; the fact-fact
lineitem⋈orders join shuffles on the order key — at 100 TB both sides
bucket on that key at write time (pipeline/warehouse.py) and the
shuffle disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_tables
from .catalog import register


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, *names)


def _dec_rev():
    """Exact decimal revenue term: double money sums are order-sensitive
    in the last cent; decimal aggregation is associative and matches the
    oracle bit-for-bit."""
    p = F.col("l_extendedprice").cast("decimal(18,4)")
    d = F.col("l_discount").cast("decimal(18,4)")
    return p * (F.lit(1).cast("decimal(18,4)") - d)


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(l_extendedprice::DECIMAL(18,4) * l_discount::DECIMAL(18,4)), 2) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
    doc="Single-scan predicate + scalar agg; all filters pushed to parquet.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * F.col("l_discount").cast("decimal(18,4)")
                ),
                2,
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS cust_nation, year(o_orderdate) AS order_year,
           CAST(ROUND(SUM(l_extendedprice::DECIMAL(18,4) * (1 - l_discount::DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2')
    GROUP BY n1.n_name, year(o_orderdate)
    """,
    doc="Fact-fact join + broadcast dims, grouped by nation/year.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(
                t["nation"].filter(F.col("n_name").isin("NATION_1", "NATION_2"))
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("cust_nation"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(
            F.round(F.sum(_dec_rev()), 2).cast("double").alias("revenue")
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(ROUND(SUM(l_extendedprice::DECIMAL(18,4) * (1 - l_discount::DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    HAVING CAST(ROUND(SUM(l_extendedprice::DECIMAL(18,4) * (1 - l_discount::DECIMAL(18,4))), 2) AS DOUBLE) > 50000.0
    """,
    doc="Returned-item revenue per customer; HAVING threshold, no tie-prone LIMIT.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(
            t["lineitem"].filter(F.col("l_returnflag") == "R"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(_dec_rev()), 2).cast("double").alias("revenue")
        )
        .filter(F.col("revenue") > 50000.0)
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                         THEN l_extendedprice::DECIMAL(18,4) * (1 - l_discount::DECIMAL(18,4))
                         ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(l_extendedprice::DECIMAL(18,4) * (1 - l_discount::DECIMAL(18,4)))
                 AS DOUBLE), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-06-01 00:00:00'
    """,
    doc="Conditional aggregation ratio; part dim broadcast.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part")
    rev = _dec_rev()
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(38,8)")
    )
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-06-01").cast("timestamp"))
        )
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 4
            ).alias("promo_pct")
        )
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           ROUND(o_totalprice, 2) AS totalprice,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    HAVING SUM(l_quantity) > 150
    """,
    doc="Group on fact key + HAVING; order-key grouping co-partitions with the join.",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders", "lineitem", "customer")
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 150)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            F.round(F.col("__qty"), 2).alias("total_qty"),
        )
    )


@register(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(l_extendedprice::DECIMAL(18,4) * (1 - l_discount::DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
    doc="Disjunctive band predicates across fact and dim (TPC-H Q19 shape).",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part")
    joined = t["lineitem"].join(
        F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey")
    )
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return joined.filter(band).agg(
        F.round(F.sum(_dec_rev()), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    doc="Semi-join existence filter + grouped count (TPC-H Q4 shape).",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders", "lineitem")
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q8_market_share",
    oracle="""
    WITH rev AS (
      SELECT year(o_orderdate) AS order_year, n_name,
             l_extendedprice::DECIMAL(18,4) * (1 - l_discount::DECIMAL(18,4)) AS r
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey  = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT order_year,
           ROUND(CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN r ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(r) AS DOUBLE), 4) AS mkt_share
    FROM rev GROUP BY order_year
    """,
    doc="Market share: conditional decimal agg over a 4-dim star join (Q8 shape).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "orders", "supplier", "nation", "region")
    rev = _dec_rev()
    joined = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    national = F.when(F.col("n_name") == "NATION_3", rev).otherwise(
        F.lit(0).cast("decimal(38,8)")
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(
                F.sum(national).cast("double") / F.sum(rev).cast("double"), 4
            ).alias("mkt_share")
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    doc="Two-level aggregation over a left join (TPC-H Q13 shape).",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(ROUND(SUM(l_extendedprice::DECIMAL(18,4)
                  * (1 - l_discount::DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    doc="Max-revenue supplier via scalar-subquery join-back (Q15 shape; ties kept).",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_dec_rev()), 2).cast("double").alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        t["supplier"]
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("__mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH rich AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(c_acctbal::DECIMAL(18,4)), 2) AS DOUBLE) AS totacctbal
    FROM rich
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    doc="Scalar-avg filter + anti join + grouped agg (TPC-H Q22 shape).",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    cust = t["customer"]
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("__avg")
    )
    no_orders = rich.join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    # acctbal sums: values have 2 decimals; decimal cast keeps the sum
    # exact under reordering like the revenue terms elsewhere
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("totacctbal"),
    )
