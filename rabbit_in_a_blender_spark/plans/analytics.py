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
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
    doc="Scalar-avg filter + anti join + grouped agg (TPC-H Q22 shape; "
    "'no orders' is date-restricted to dormant-since-1999 because every "
    "fixture customer has SOME order — the unrestricted row passed "
    "vacuously on 0 rows).",
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
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    no_orders = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    # acctbal sums: values have 2 decimals; decimal cast keeps the sum
    # exact under reordering like the revenue terms elsewhere
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("totacctbal"),
    )


# ---------------------------------------------------------------------------
# TPC-H completion (round 7): the 8 remaining query shapes, adapted to the
# driver schema.  The testdata has no partsupp table and lineitem carries no
# commit/receipt dates, so:
#   - supply relationships and costs derive from lineitem itself: the
#     distinct (l_partkey, l_suppkey) pairs are the partsupp rows, and
#     MIN(l_extendedprice / l_quantity) per pair is the supply-cost proxy
#     (exact-min of per-row doubles — order-insensitive, hash-safe);
#   - "late" is l_shipdate > o_orderdate + INTERVAL N DAYS instead of
#     receipt-vs-commit.
# Shapes (correlated-min, two-level agg + scalar threshold, conditional
# counts, distinct-count with exclusions, avg-qty correlated filter,
# dominant-supplier semi join, exists/not-exists per order) all survive.
# Reference behavior: RiaB issues these as engine SQL; here each is a
# declarative DataFrame plan with broadcast dims so Catalyst keeps the
# fact scan single-pass.
# ---------------------------------------------------------------------------


def _supply(t: dict[str, DataFrame]) -> DataFrame:
    """partsupp stand-in: one row per (partkey, suppkey) seen in lineitem
    with the minimum observed unit price as supply_cost.

    MIN over per-row doubles is exactly deterministic (no FP summation),
    so Spark and DuckDB agree bit-for-bit.
    """
    return (
        t["lineitem"]
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_cost"))
    )


_SUPPLY_SQL = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice / l_quantity) AS ps_cost
      FROM lineitem GROUP BY 1, 2
"""


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    eur AS (
      SELECT ps_partkey, ps_cost, s_name, s_acctbal, n_name
      FROM supply
      JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT p_partkey, p_name, s_name, n_name,
           ROUND(s_acctbal, 2) AS acctbal,
           ROUND(ps_cost, 4) AS supply_cost
    FROM eur
    JOIN part ON p_partkey = ps_partkey
    WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
      AND ps_cost = (SELECT MIN(e2.ps_cost) FROM eur e2
                     WHERE e2.ps_partkey = eur.ps_partkey)
    """,
    doc="Q2 shape: correlated per-part MIN over region-filtered supply; ties kept.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "supplier", "nation", "region", "part")
    eur = (
        _supply(t)
        .join(F.broadcast(t["supplier"]), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("ps_partkey", "ps_cost", "s_name", "s_acctbal", "n_name")
    )
    min_cost = eur.groupBy("ps_partkey").agg(F.min("ps_cost").alias("__min_cost"))
    return (
        eur.join(min_cost, "ps_partkey")
        .filter(F.col("ps_cost") == F.col("__min_cost"))
        .join(
            F.broadcast(
                t["part"].filter(
                    F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
                )
            ),
            F.col("p_partkey") == F.col("ps_partkey"),
        )
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            F.round("ps_cost", 4).alias("supply_cost"),
        )
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS supp_nation, year(o_orderdate) AS order_year,
           CAST(ROUND(SUM(l_extendedprice::DECIMAL(18,4) * (1 - l_discount::DECIMAL(18,4))), 2) AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN part     ON l_partkey  = p_partkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, year(o_orderdate)
    """,
    doc="Q9 shape: 5-way star join, part-name predicate, nation/year profit rollup.",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "orders", "supplier", "nation", "part")
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%gear%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(F.round(F.sum(_dec_rev()), 2).cast("double").alias("profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT l_partkey AS partkey,
             SUM(l_extendedprice::DECIMAL(18,4)) AS v
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY 1
    )
    SELECT partkey, CAST(ROUND(v, 2) AS DOUBLE) AS stock_value
    FROM val
    WHERE CAST(v AS DOUBLE) > (SELECT CAST(SUM(v) AS DOUBLE) FROM val) * 0.001
    """,
    doc="Q11 shape: per-part value for one nation's suppliers, kept above a "
    "scalar fraction of the total (decimal sums, double threshold compare).",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    val = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("v"))
    )
    total = val.agg(F.sum("v").cast("double").alias("__total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v").cast("double") > F.col("__total") * 0.001)
        .select("partkey", F.round("v", 2).cast("double").alias("stock_value"))
    )


@register(
    "q12_ship_lag_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    doc="Q12 shape: ship-lag predicate (no receipt/commit dates in the driver "
    "schema) + priority-bucketed conditional counts per line status.",
)
def q12_ship_lag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
          FROM lineitem) pairs
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="Q16 shape: distinct-supplier counts per part attribute over "
    "lineitem-derived supply pairs, with brand/type/size and supplier "
    "exclusions (negative acctbal as the complaints proxy).",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part", "supplier")
    pairs = t["lineitem"].select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    part = t["part"].filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    return (
        pairs.join(
            F.broadcast(bad_supp),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("ps_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    WITH avgq AS (
      SELECT l_partkey AS partkey, AVG(l_quantity) AS aq
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(ROUND(SUM(l_extendedprice::DECIMAL(18,4)) / 7, 2) AS DOUBLE) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN avgq ON partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND l_quantity < 0.5 * aq
    """,
    doc="Q17 shape: per-part AVG(quantity) joined back as a correlated "
    "threshold (quantities are integral doubles, so the AVG is bit-exact "
    "in both engines).",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part")
    avgq = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.avg("l_quantity").alias("aq"))
    )
    return (
        t["lineitem"]
        .join(
            F.broadcast(
                t["part"].filter(
                    (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(avgq, F.col("partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,4)")) / 7)
            .cast("decimal(38,10)")
            .alias("__s"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            F.round("__s", 2).cast("double").alias("avg_yearly"),
            "n_lines",
        )
    )


@register(
    "q20_excess_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey AS suppkey, l_partkey AS partkey,
             SUM(l_quantity) AS pair_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY 1, 2
    ),
    part_total AS (
      SELECT partkey AS tp, SUM(pair_qty) AS total_qty FROM shipped GROUP BY 1
    ),
    dominant AS (
      SELECT DISTINCT suppkey FROM shipped
      JOIN part_total ON tp = partkey
      WHERE pair_qty > 0.4 * total_qty
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND s_suppkey IN (SELECT suppkey FROM dominant)
    """,
    doc="Q20 shape: suppliers dominating a filtered part's 1997 shipments "
    "(no availqty column — the per-part total is the correlated scalar), "
    "semi-joined to one region's supplier list.",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation", "region")
    small_parts = t["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy(
            F.col("l_suppkey").alias("suppkey"), F.col("l_partkey").alias("partkey")
        )
        .agg(F.sum("l_quantity").alias("pair_qty"))
    )
    part_total = shipped.groupBy(F.col("partkey").alias("tp")).agg(
        F.sum("pair_qty").alias("total_qty")
    )
    dominant = (
        shipped.join(part_total, F.col("tp") == F.col("partkey"))
        .filter(F.col("pair_qty") > 0.4 * F.col("total_qty"))
        .select("suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(dominant, F.col("s_suppkey") == F.col("suppkey"), "left_semi")
        .select("s_name", "n_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 75 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late_supp
      FROM li GROUP BY 1
    )
    SELECT s_name, CAST(COUNT(DISTINCT li.l_orderkey) AS BIGINT) AS numwait
    FROM li
    JOIN per_order po ON li.l_orderkey = po.l_orderkey
    JOIN supplier ON li.l_suppkey = s_suppkey
    WHERE li.late = 1 AND po.n_supp > 1 AND po.n_late_supp = 1
    GROUP BY s_name
    """,
    doc="Q21 shape: the sole-late-supplier-on-a-multi-supplier-order test, "
    "expressed as one per-order distinct-count aggregation instead of "
    "EXISTS/NOT-EXISTS self-joins (same predicate, one shuffle on the "
    "order key; lateness = 75-day ship lag).",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    li = (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS"),
                1,
            )
            .otherwise(0)
            .alias("late"),
        )
    )
    per_order = li.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    return (
        li.filter(F.col("late") == 1)
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )
