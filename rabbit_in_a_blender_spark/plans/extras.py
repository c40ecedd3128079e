"""Additional operator coverage: parameterized SQL (A10), pivot summary
(G5), update-from-join (M2), delete-in-list (M3), and Spark-native
extensions beyond the reference surface (rollup, lag windows, as-of
join, distinct profiling)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_tables
from ..operators.asof import asof_join
from .catalog import register


# A10 + B5: parameterized query execution (spark.sql named params — the
# reference's @etl_start scalar params, etl/bigquery/etl.py:66-89).
@register(
    "a10_param_query",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
                THEN 'old' ELSE 'recent' END AS age_band
    FROM orders WHERE o_totalprice > 500.0
    """,
)
def a10_param_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "orders")["orders"].createOrReplaceTempView(
        "__orders_param"
    )
    return spark.sql(
        """
        SELECT o_orderkey,
               CASE WHEN o_orderdate < :etl_start THEN 'old' ELSE 'recent' END
                 AS age_band
        FROM __orders_param WHERE o_totalprice > :min_price
        """,
        args={"etl_start": "1997-06-30 00:00:00", "min_price": 500.0},
    )


# G5: multi-filter count summary with pivot (DQD rollup shape,
# etl/data_quality.py:280-320 / dashboard pivot :380-545).
@register(
    "g5_pivot_summary",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS st_O,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS st_F,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS st_P
    FROM orders GROUP BY o_orderpriority
    """,
)
def g5_pivot_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"st_{s}") for s in ["O", "F", "P"]],
    )


# M2: UPDATE ... FROM (join-driven update of missing values,
# bq:etl/{omop_table}__{concept_id_column}_usagi_update_custom_concepts.sql.jinja)
@register(
    "m2_update_from_join",
    oracle="""
    SELECT c.c_custkey,
           CAST(CASE WHEN c.c_nationkey = 0 THEN n.n_regionkey
                     ELSE c.c_nationkey END AS BIGINT) AS patched_key
    FROM customer c
    LEFT JOIN nation n ON n.n_nationkey = 5
    """,
    doc="Rows with sentinel value get patched from a joined subquery.",
)
def m2_update_from_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "nation")
    patch = t["nation"].filter(F.col("n_nationkey") == 5).select("n_regionkey")
    return (
        t["customer"]
        .join(F.broadcast(patch), F.lit(True), "left")
        .select(
            "c_custkey",
            F.when(F.col("c_nationkey") == 0, F.col("n_regionkey"))
            .otherwise(F.col("c_nationkey"))
            .cast("long")
            .alias("patched_key"),
        )
    )


# M3: DELETE WHERE col IN (list)
@register(
    "m3_delete_isin",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE n_nationkey NOT IN (1, 3, 5, 7)
    """,
)
def m3_delete_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_tables(spark, sf_dir, "nation")["nation"]
    return n.filter(~F.col("n_nationkey").isin(1, 3, 5, 7)).select(
        "n_nationkey", "n_name"
    )


# Extension: ROLLUP aggregation (Spark/DuckDB both native; beyond the
# reference surface — SURVEY §2.D note).
@register(
    "ext_rollup_revenue",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           ROUND(SUM(o_totalprice), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def ext_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "revenue",
            "n_orders",
        )
    )


# Extension: lag/delta window (frame-based windows; reference uses none).
@register(
    "ext_lag_delta",
    oracle="""
    SELECT event_id, user_id,
           ROUND(value - COALESCE(lag(value) OVER w, 0.0), 3) AS value_delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ext_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(
            F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 3
        ).alias("value_delta"),
    )


# Extension: as-of join (backward) — latest order at or before each event.
@register(
    "ext_asof_join",
    oracle="""
    SELECT e.event_id, e.user_id,
           o.o_orderkey AS last_orderkey,
           ROUND(o.o_totalprice, 2) AS last_totalprice
    FROM events e
    ASOF LEFT JOIN (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
      FROM orders
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC
      ) = 1
    ) o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    doc="Union-merge as-of join; right side deduped to latest per (key, ts).",
)
def ext_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import dedup_keep_first

    t = load_tables(spark, sf_dir, "events", "orders")
    # Dedup right side to one row per (key, ts) — DuckDB's ASOF picks one
    # arbitrary match on ties; pin the same winner (max o_orderkey).
    orders = dedup_keep_first(
        t["orders"].select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        ["o_custkey", "o_orderdate"],
        [F.col("o_orderkey").desc()],
    )
    joined = asof_join(
        t["events"].select("event_id", "user_id", "ts"),
        orders.withColumnRenamed("o_custkey", "user_id"),
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.round("o_totalprice", 2).alias("last_totalprice"),
    )


# Extension: distinct-value profiling (exact here for oracle parity; the
# engine's approx variant is ext/profile.approx_distinct_profile).
@register(
    "ext_profile_distinct",
    oracle="""
    SELECT 'orders' AS table_name,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT)      AS n_custkeys,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)  AS n_statuses,
           CAST(COUNT(*) AS BIGINT)                       AS n_rows
    FROM orders
    """,
)
def ext_profile_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return o.agg(
        F.lit("orders").alias("table_name"),
        F.count_distinct(F.col("o_custkey")).alias("n_custkeys"),
        F.count_distinct(F.col("o_orderstatus")).alias("n_statuses"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "skew_salted_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(SUM(l_quantity) AS DOUBLE), 2) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Two-phase salted aggregation == plain groupBy (skew-safe path).",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.skew import salted_agg

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    out = salted_agg(
        li,
        ["l_returnflag"],
        {"l_quantity": "sum", "l_orderkey": "count"},
        salt_col="l_orderkey",
        salts=16,
    )
    return out.select(
        "l_returnflag",
        F.round(F.col("sum_l_quantity"), 2).alias("sum_qty"),
        F.col("count_l_orderkey").alias("n_rows"),
    )


@register(
    "ev_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS viewed,
           CAST(COUNT(*) FILTER (t_click > t_view) AS BIGINT) AS clicked_after_view,
           CAST(COUNT(*) FILTER (t_buy > t_click AND t_click > t_view) AS BIGINT)
             AS purchased_in_order
    FROM per_user WHERE t_view IS NOT NULL
    """,
    doc="Ordered funnel view→click→purchase via conditional-min per user.",
)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    per_user = ev.groupBy("user_id").agg(
        first("view").alias("t_view"),
        first("click").alias("t_click"),
        first("purchase").alias("t_buy"),
    )
    viewed = per_user.filter(F.col("t_view").isNotNull())
    return viewed.agg(
        F.count(F.lit(1)).alias("viewed"),
        F.sum(F.when(F.col("t_click") > F.col("t_view"), 1).otherwise(0))
        .cast("long")
        .alias("clicked_after_view"),
        F.sum(
            F.when(
                (F.col("t_buy") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("purchased_in_order"),
    )


@register(
    "ev_retention",
    oracle="""
    WITH d0 AS (
      SELECT DISTINCT user_id FROM events
      WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
    ), dn AS (
      SELECT DISTINCT user_id FROM events
      WHERE ts >= TIMESTAMP '2024-01-22 00:00:00'
    )
    SELECT CAST((SELECT COUNT(*) FROM d0) AS BIGINT) AS week1_users,
           CAST(COUNT(*) AS BIGINT) AS retained_week4
    FROM d0 WHERE user_id IN (SELECT user_id FROM dn)
    """,
    doc="Week-1 → week-4 retention via distinct-user semi join.",
)
def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    d0 = (
        ev.filter(F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
        .select("user_id")
        .distinct()
    )
    dn = (
        ev.filter(F.col("ts") >= F.lit("2024-01-22").cast("timestamp"))
        .select("user_id")
        .distinct()
    )
    week1 = d0.count()  # metadata scalar (distinct-user count, dim-sized)
    retained = d0.join(dn, "user_id", "left_semi")
    return retained.agg(
        F.lit(week1).cast("long").alias("week1_users"),
        F.count(F.lit(1)).alias("retained_week4"),
    )


@register(
    "ext_cube_counts",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE aggregation (all grouping-set combinations).",
)
def ext_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "ext_ntile_quartiles",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS balance_quartile
    FROM customer
    """,
    doc="NTILE window, unique tie-break for determinism.  Global-order "
    "window is intentional: quartiling a DIMENSION table (customers). "
    "For fact-sized quartiles use percentile_approx thresholds + a "
    "partition-free bucket expression instead.",
)
def ext_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = load_tables(spark, sf_dir, "customer")["customer"]
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey", F.ntile(4).over(w).alias("balance_quartile")
    )


@register(
    "u6_intersect_except",
    oracle="""
    WITH click_users AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         buy_users   AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         both_u  AS (SELECT user_id FROM click_users INTERSECT SELECT user_id FROM buy_users),
         only_c  AS (SELECT user_id FROM click_users EXCEPT   SELECT user_id FROM buy_users)
    SELECT 'clicked_and_bought' AS segment, user_id FROM both_u
    UNION ALL
    SELECT 'clicked_never_bought' AS segment, user_id FROM only_c
    """,
    doc="INTERSECT / EXCEPT set operators (not in the reference; Spark built-ins).",
)
def u6_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    both = clicks.intersect(buys).select(
        F.lit("clicked_and_bought").alias("segment"), "user_id"
    )
    only = clicks.exceptAll(buys).select(
        F.lit("clicked_never_bought").alias("segment"), "user_id"
    )
    return both.unionByName(only)


@register(
    "ext_json_typed",
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed
    FROM events WHERE props IS NOT NULL
    """,
    doc="from_json with an explicit schema (typed struct extraction).",
)
def ext_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    parsed = ev.filter(F.col("props").isNotNull()).select(
        "event_id", F.from_json(F.col("props"), "k BIGINT").alias("__j")
    )
    return parsed.select("event_id", F.col("__j.k").alias("k_typed"))


@register(
    "ext_interval_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS win_id, user_id, ts AS win_start,
             ts + INTERVAL 2 HOUR AS win_end
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, win_id, e.event_id AS click_id
    FROM events e
    JOIN purchases p
      ON e.user_id = p.user_id
     AND e.ts >= p.win_start AND e.ts <= p.win_end
    WHERE e.event_type = 'click'
    """,
    doc="Bucketized interval join (operators/interval.py): clicks inside "
    "each purchase's 2-hour window meet on (user, time-bucket) instead "
    "of fanning out the full per-user cross product.",
)
def ext_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.interval import interval_join

    ev = load_tables(spark, sf_dir, "events")["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts")
    )
    wins = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("win_id"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("win_end"),
    )
    return interval_join(
        clicks, wins, ["user_id"], "ts", "win_start", "win_end",
        bucket_seconds=3600,
    ).select("user_id", "win_id", "click_id")


@register(
    "ev_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM events
    ),
    counts AS (
      SELECT prev AS prev_type, event_type AS next_type, COUNT(*) AS c
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, CAST(c AS BIGINT) AS n_transitions,
           ROUND(c * 1.0 / SUM(c) OVER (PARTITION BY prev_type), 4) AS prob
    FROM counts
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences (lag window keyed on the user, counts + row-normalized "
    "probabilities; id tie-break makes the sequence deterministic). "
    "The lag window shuffles once on user_id; the matrix itself is "
    "|event_types|^2 rows — metadata-sized at any scale.",
)
def ev_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    tot = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(tot), 4
        ).alias("prob"),
    )
