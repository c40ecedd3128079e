"""DQD-check and Achilles-statistics queries (SURVEY §2.K, G5/G6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_tables
from ..quality.checks import fk_orphans, plausible_value_low, start_before_end
from .catalog import register


def _pseudo_cdm(spark: SparkSession, sf_dir: str):
    """Deterministic pseudo-CDM over the driver testdata, used to
    hash-prove the Achilles analysis catalog: person ← customer,
    visit_occurrence ← orders, observation_period ← per-customer order
    span.  Pure column arithmetic so the DuckDB oracle derives the
    identical CDM."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    c, o = t["customer"], t["orders"]
    person = c.select(
        F.col("c_custkey").alias("person_id"),
        (F.lit(8507) + F.col("c_custkey") % 2).alias("gender_concept_id"),
        (F.lit(1940) + F.col("c_custkey") % 60).alias("year_of_birth"),
        F.col("c_nationkey").alias("race_concept_id"),
        (F.col("c_nationkey") % 5).alias("ethnicity_concept_id"),
    )
    odate = F.col("o_orderdate").cast("date")
    visit = o.select(
        F.col("o_orderkey").alias("visit_occurrence_id"),
        F.col("o_custkey").alias("person_id"),
        (F.lit(9201) + F.col("o_orderkey") % 3).alias("visit_concept_id"),
        odate.alias("visit_start_date"),
        F.date_add(odate, (F.col("o_orderkey") % 14).cast("int")).alias(
            "visit_end_date"
        ),
    )
    obs = o.groupBy(F.col("o_custkey").alias("person_id")).agg(
        F.min(odate).alias("observation_period_start_date"),
        F.max(odate).alias("observation_period_end_date"),
    )
    k = F.col("o_orderkey")
    measurement = o.select(
        k.alias("measurement_id"),
        F.col("o_custkey").alias("person_id"),
        F.when(k % 3 == 0, 3036277)
        .when(k % 3 == 1, 3025315)
        .otherwise(3027018)
        .alias("measurement_concept_id"),
        odate.alias("measurement_date"),
        F.when(k % 5 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice"))
        .alias("value_as_number"),
        F.when(k % 7 == 0, F.lit(None).cast("long"))
        .otherwise(
            F.when(k % 4 == 0, 8582)
            .when(k % 4 == 1, 9529)
            .when(k % 4 == 2, 8541)
            .otherwise(8582)
            .cast("long")
        )
        .alias("unit_concept_id"),
        F.lit(50000.0).alias("range_low"),
        F.lit(300000.0).alias("range_high"),
    )
    condition = o.select(
        k.alias("condition_occurrence_id"),
        F.col("o_custkey").alias("person_id"),
        F.when(k % 4 == 0, 4163261)
        .when(k % 4 == 1, 4299535)
        .otherwise(201826)
        .alias("condition_concept_id"),
        odate.alias("condition_start_date"),
    )
    source = spark.createDataFrame(
        [("spark-graft",)], "cdm_source_name string"
    )
    tables = {
        "person": person,
        "visit_occurrence": visit,
        "observation_period": obs,
        "measurement": measurement,
        "condition_occurrence": condition,
        "cdm_source": source,
    }
    return tables.get


# Shared oracle CTEs deriving the identical pseudo-CDM in DuckDB.
_PSEUDO_CDM_SQL = """
    WITH person AS (
      SELECT c_custkey AS person_id,
             8507 + (c_custkey % 2)  AS gender_concept_id,
             1940 + (c_custkey % 60) AS year_of_birth,
             c_nationkey             AS race_concept_id,
             (c_nationkey % 5)       AS ethnicity_concept_id
      FROM customer),
    op AS (
      SELECT o_custkey AS person_id,
             MIN(CAST(o_orderdate AS DATE)) AS op_start,
             MAX(CAST(o_orderdate AS DATE)) AS op_end
      FROM orders GROUP BY o_custkey),
    visit AS (
      SELECT o_orderkey AS visit_occurrence_id,
             o_custkey  AS person_id,
             9201 + (o_orderkey % 3) AS visit_concept_id,
             CAST(o_orderdate AS DATE) AS visit_start_date,
             CAST(o_orderdate AS DATE) + CAST(o_orderkey % 14 AS INTEGER)
               AS visit_end_date
      FROM orders),
    measurement AS (
      SELECT o_orderkey AS measurement_id,
             o_custkey  AS person_id,
             CASE CAST(o_orderkey % 3 AS INTEGER)
               WHEN 0 THEN 3036277 WHEN 1 THEN 3025315 ELSE 3027018
             END AS measurement_concept_id,
             CAST(o_orderdate AS DATE) AS measurement_date,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  ELSE o_totalprice END AS value_as_number,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  WHEN o_orderkey % 4 = 0 THEN 8582
                  WHEN o_orderkey % 4 = 1 THEN 9529
                  WHEN o_orderkey % 4 = 2 THEN 8541
                  ELSE 8582 END AS unit_concept_id,
             50000.0  AS range_low,
             300000.0 AS range_high
      FROM orders),
    cond AS (
      SELECT o_orderkey AS condition_occurrence_id,
             o_custkey  AS person_id,
             CASE CAST(o_orderkey % 4 AS INTEGER)
               WHEN 0 THEN 4163261 WHEN 1 THEN 4299535 ELSE 201826
             END AS condition_concept_id,
             CAST(o_orderdate AS DATE) AS condition_start_date
      FROM orders)
"""

_PAD = (
    "CAST(NULL AS VARCHAR) AS stratum_2, CAST(NULL AS VARCHAR) AS stratum_3, "
    "CAST(NULL AS VARCHAR) AS stratum_4, CAST(NULL AS VARCHAR) AS stratum_5"
)
_PAD3 = (
    "CAST(NULL AS VARCHAR) AS stratum_3, "
    "CAST(NULL AS VARCHAR) AS stratum_4, CAST(NULL AS VARCHAR) AS stratum_5"
)


def _pseudo_cdm_ext(spark: SparkSession, sf_dir: str):
    """The pseudo-CDM plus the round-3 table families — location,
    care_site, payer_plan_period, cost, cohort, visit_detail, episode —
    all pure column arithmetic over nation/customer/orders/lineitem so
    the DuckDB oracle (``_PSEUDO_EXT_SQL``) derives the identical CDM."""
    base = _pseudo_cdm(spark, sf_dir)
    t = load_tables(spark, sf_dir, "nation", "customer", "orders", "lineitem")
    n, c, o, li = t["nation"], t["customer"], t["orders"], t["lineitem"]
    location = n.select(
        F.col("n_nationkey").alias("location_id"),
        (F.lit(10000) + F.col("n_nationkey") * 373).cast("string").alias("zip"),
        F.concat(F.lit("ST"), (F.col("n_nationkey") % 10).cast("string")).alias(
            "state"
        ),
    )
    care_site = n.select(
        (F.col("n_nationkey") + 1).alias("care_site_id"),
        (F.lit(8717) + F.col("n_nationkey") % 3).alias(
            "place_of_service_concept_id"
        ),
        F.col("n_nationkey").alias("location_id"),
    )
    person = base("person").join(
        c.select(
            F.col("c_custkey").alias("person_id"),
            F.col("c_nationkey").alias("location_id"),
            (F.col("c_nationkey") + 1).alias("care_site_id"),
        ),
        "person_id",
    )
    odate = F.col("o_orderdate").cast("date")
    payer = o.select(
        F.col("o_orderkey").alias("payer_plan_period_id"),
        F.col("o_custkey").alias("person_id"),
        odate.alias("payer_plan_period_start_date"),
        F.date_add(odate, (F.col("o_orderkey") % 365).cast("int")).alias(
            "payer_plan_period_end_date"
        ),
        (F.lit(32021) + F.col("o_orderkey") % 4).alias("payer_concept_id"),
    )
    cost = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("cost_id"),
        F.when(F.col("l_linenumber") % 3 == 0, "Drug")
        .when(F.col("l_linenumber") % 3 == 1, "Procedure")
        .otherwise("Visit")
        .alias("cost_domain_id"),
        # cost→event linkage (r6): the costed event's id — Drug rows
        # bind to drug_exposure, Procedure rows to procedure_occurrence
        # (both share the lineitem-derived id space below), unblocking
        # the 1506-1509 per-domain cost-by-event-concept distributions
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
            "cost_event_id"
        ),
        (F.lit(5031) + F.col("l_suppkey") % 2).alias("cost_type_concept_id"),
        (F.lit(44818668) + F.col("l_partkey") % 2).alias("currency_concept_id"),
        F.col("l_extendedprice").alias("total_charge"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
            "total_paid"
        ),
        F.col("l_orderkey").alias("payer_plan_period_id"),
    )
    lio = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    drug_exposure = lio.filter(F.col("l_linenumber") % 3 == 0).select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
            "drug_exposure_id"
        ),
        F.col("o_custkey").alias("person_id"),
        (F.lit(1125315) + F.col("l_partkey") % 4).alias("drug_concept_id"),
        F.col("l_shipdate").cast("date").alias("drug_exposure_start_date"),
    )
    procedure_occurrence = lio.filter(F.col("l_linenumber") % 3 == 1).select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
            "procedure_occurrence_id"
        ),
        F.col("o_custkey").alias("person_id"),
        (F.lit(4030731) + F.col("l_partkey") % 3).alias("procedure_concept_id"),
        F.col("l_shipdate").cast("date").alias("procedure_date"),
    )
    cstart = F.date_add(
        F.lit("1995-01-01").cast("date"), (F.col("c_custkey") % 1000).cast("int")
    )
    cohort_one = c.select(
        (F.col("c_custkey") % 3).alias("cohort_definition_id"),
        F.col("c_custkey").alias("subject_id"),
        cstart.alias("cohort_start_date"),
        F.date_add(cstart, (F.col("c_custkey") % 200).cast("int")).alias(
            "cohort_end_date"
        ),
    )
    cohort_two = c.filter(F.col("c_custkey") % 4 == 0).select(
        (F.col("c_custkey") % 3).alias("cohort_definition_id"),
        F.col("c_custkey").alias("subject_id"),
        F.date_add(cstart, 30).alias("cohort_start_date"),
        F.date_add(
            F.date_add(cstart, (F.col("c_custkey") % 200).cast("int")), 30
        ).alias("cohort_end_date"),
    )
    cohort = cohort_one.unionByName(cohort_two)
    vd = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
            "visit_detail_id"
        ),
        F.col("o_custkey").alias("person_id"),
        (F.lit(581476) + F.col("l_linenumber") % 3).alias(
            "visit_detail_concept_id"
        ),
        F.col("l_shipdate").cast("date").alias("visit_detail_start_date"),
        F.date_add(
            F.col("l_shipdate").cast("date"),
            (F.col("l_linenumber") % 7 + 1).cast("int"),
        ).alias("visit_detail_end_date"),
        (F.lit(44818517) + F.col("l_partkey") % 2).alias(
            "visit_detail_type_concept_id"
        ),
        F.col("l_orderkey").alias("visit_occurrence_id"),
        (F.col("l_suppkey") % 25 + 1).alias("care_site_id"),
    )
    episode = o.select(
        F.col("o_orderkey").alias("episode_id"),
        F.col("o_custkey").alias("person_id"),
        (F.lit(32528) + F.col("o_orderkey") % 3).alias("episode_concept_id"),
        odate.alias("episode_start_date"),
        F.date_add(odate, (F.col("o_orderkey") % 90).cast("int")).alias(
            "episode_end_date"
        ),
        (F.lit(4000000) + F.col("o_orderkey") % 5).alias(
            "episode_object_concept_id"
        ),
        (F.lit(32545) + F.col("o_orderkey") % 2).alias(
            "episode_type_concept_id"
        ),
    )
    extra = {
        "person": person,
        "location": location,
        "care_site": care_site,
        "payer_plan_period": payer,
        "cost": cost,
        "cohort": cohort,
        "visit_detail": vd,
        "episode": episode,
        "drug_exposure": drug_exposure,
        "procedure_occurrence": procedure_occurrence,
    }
    return lambda name: extra.get(name) if name in extra else base(name)


# Oracle CTEs for the extended pseudo-CDM (appended to _PSEUDO_CDM_SQL).
_PSEUDO_EXT_SQL = """,
    loc AS (
      SELECT n_nationkey AS location_id,
             CAST(10000 + n_nationkey * 373 AS VARCHAR) AS zip,
             'ST' || CAST(n_nationkey % 10 AS VARCHAR)  AS state
      FROM nation),
    care_site AS (
      SELECT n_nationkey + 1       AS care_site_id,
             8717 + (n_nationkey % 3) AS place_of_service_concept_id,
             n_nationkey           AS location_id
      FROM nation),
    person_ext AS (
      SELECT p.*, c_nationkey AS location_id, c_nationkey + 1 AS care_site_id
      FROM person p JOIN customer ON p.person_id = c_custkey),
    payer AS (
      SELECT o_orderkey AS payer_plan_period_id,
             o_custkey  AS person_id,
             CAST(o_orderdate AS DATE) AS pstart,
             CAST(o_orderdate AS DATE) + CAST(o_orderkey % 365 AS INTEGER)
               AS pend,
             32021 + (o_orderkey % 4) AS payer_concept_id
      FROM orders),
    cost AS (
      SELECT l_orderkey * 10 + l_linenumber AS cost_id,
             CASE CAST(l_linenumber % 3 AS INTEGER)
               WHEN 0 THEN 'Drug' WHEN 1 THEN 'Procedure' ELSE 'Visit'
             END AS cost_domain_id,
             l_orderkey * 10 + l_linenumber AS cost_event_id,
             5031 + (l_suppkey % 2)     AS cost_type_concept_id,
             44818668 + (l_partkey % 2) AS currency_concept_id,
             l_extendedprice            AS total_charge,
             l_extendedprice * (1 - l_discount) AS total_paid,
             l_orderkey                 AS payer_plan_period_id
      FROM lineitem),
    drugex AS (
      SELECT l_orderkey * 10 + l_linenumber AS drug_exposure_id,
             o_custkey                  AS person_id,
             1125315 + (l_partkey % 4)  AS drug_concept_id,
             CAST(l_shipdate AS DATE)   AS drug_exposure_start_date
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_linenumber % 3 = 0),
    procex AS (
      SELECT l_orderkey * 10 + l_linenumber AS procedure_occurrence_id,
             o_custkey                  AS person_id,
             4030731 + (l_partkey % 3)  AS procedure_concept_id,
             CAST(l_shipdate AS DATE)   AS procedure_date
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_linenumber % 3 = 1),
    cohort AS (
      SELECT c_custkey % 3 AS cohort_definition_id,
             c_custkey     AS subject_id,
             DATE '1995-01-01' + CAST(c_custkey % 1000 AS INTEGER)
               AS cohort_start_date,
             DATE '1995-01-01' + CAST(c_custkey % 1000 AS INTEGER)
               + CAST(c_custkey % 200 AS INTEGER) AS cohort_end_date
      FROM customer
      UNION ALL
      SELECT c_custkey % 3, c_custkey,
             DATE '1995-01-01' + CAST(c_custkey % 1000 AS INTEGER) + 30,
             DATE '1995-01-01' + CAST(c_custkey % 1000 AS INTEGER)
               + CAST(c_custkey % 200 AS INTEGER) + 30
      FROM customer WHERE c_custkey % 4 = 0),
    vdetail AS (
      SELECT l_orderkey * 10 + l_linenumber AS visit_detail_id,
             o_custkey AS person_id,
             581476 + (l_linenumber % 3) AS visit_detail_concept_id,
             CAST(l_shipdate AS DATE)    AS vd_start,
             CAST(l_shipdate AS DATE)
               + CAST((l_linenumber % 7) + 1 AS INTEGER) AS vd_end,
             44818517 + (l_partkey % 2)  AS visit_detail_type_concept_id,
             l_orderkey                  AS visit_occurrence_id,
             (l_suppkey % 25) + 1        AS care_site_id
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    episode AS (
      SELECT o_orderkey AS episode_id,
             o_custkey  AS person_id,
             32528 + (o_orderkey % 3) AS episode_concept_id,
             CAST(o_orderdate AS DATE) AS ep_start,
             CAST(o_orderdate AS DATE) + CAST(o_orderkey % 90 AS INTEGER)
               AS ep_end,
             4000000 + (o_orderkey % 5) AS episode_object_concept_id,
             32545 + (o_orderkey % 2)   AS episode_type_concept_id
      FROM orders)
"""


# Achilles content catalog, counts shape: 13 public analysis ids
# (0-5 demographics, 101/111/112/113 observation period, 200/201/220
# visits) through quality/achilles_catalog.run_catalog → one
# achilles_results frame (reference merge etl/achilles.py:507-561).
@register(
    "achilles_counts_catalog",
    oracle=_PSEUDO_CDM_SQL
    + f"""
    SELECT 0 AS analysis_id, 'spark-graft' AS stratum_1, {_PAD},
           CAST(1 AS BIGINT) AS count_value
    UNION ALL
    SELECT 1, CAST(NULL AS VARCHAR), {_PAD}, CAST(COUNT(*) AS BIGINT) FROM person
    UNION ALL
    SELECT 2, CAST(gender_concept_id AS VARCHAR), {_PAD},
           CAST(COUNT(*) AS BIGINT)
    FROM person GROUP BY gender_concept_id
    UNION ALL
    SELECT 3, CAST(year_of_birth AS VARCHAR), {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM person GROUP BY year_of_birth
    UNION ALL
    SELECT 4, CAST(race_concept_id AS VARCHAR), {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM person GROUP BY race_concept_id
    UNION ALL
    SELECT 5, CAST(ethnicity_concept_id AS VARCHAR), {_PAD},
           CAST(COUNT(*) AS BIGINT)
    FROM person GROUP BY ethnicity_concept_id
    UNION ALL
    SELECT 101, CAST(year(op.op_start) - p.year_of_birth AS VARCHAR), {_PAD},
           CAST(COUNT(*) AS BIGINT)
    FROM op JOIN person p USING (person_id)
    GROUP BY year(op.op_start) - p.year_of_birth
    UNION ALL
    SELECT 111, strftime(op_start, '%Y%m'), {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM op GROUP BY strftime(op_start, '%Y%m')
    UNION ALL
    SELECT 112, strftime(op_end, '%Y%m'), {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM op GROUP BY strftime(op_end, '%Y%m')
    UNION ALL
    SELECT 113, CAST(cnt AS VARCHAR), {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM (SELECT person_id, COUNT(*) AS cnt FROM op GROUP BY person_id)
    GROUP BY cnt
    UNION ALL
    SELECT 200, CAST(visit_concept_id AS VARCHAR), {_PAD},
           CAST(COUNT(*) AS BIGINT)
    FROM (SELECT DISTINCT person_id, visit_concept_id FROM visit)
    GROUP BY visit_concept_id
    UNION ALL
    SELECT 201, CAST(visit_concept_id AS VARCHAR), {_PAD},
           CAST(COUNT(*) AS BIGINT)
    FROM visit GROUP BY visit_concept_id
    UNION ALL
    SELECT 202, CAST(visit_concept_id AS VARCHAR),
           CAST(gender_concept_id AS VARCHAR) AS stratum_2, {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM (SELECT DISTINCT v.person_id, v.visit_concept_id, p.gender_concept_id
          FROM visit v JOIN person p USING (person_id))
    GROUP BY visit_concept_id, gender_concept_id
    UNION ALL
    SELECT 204, CAST(visit_concept_id AS VARCHAR),
           CAST(age_decade AS VARCHAR) AS stratum_2, {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM (SELECT DISTINCT v.person_id, v.visit_concept_id,
                 CAST(floor((year(v.visit_start_date) - p.year_of_birth) / 10)
                      AS INTEGER) AS age_decade
          FROM visit v JOIN person p USING (person_id))
    GROUP BY visit_concept_id, age_decade
    UNION ALL
    SELECT 220, strftime(visit_start_date, '%Y%m'), {_PAD},
           CAST(COUNT(*) AS BIGINT)
    FROM visit GROUP BY strftime(visit_start_date, '%Y%m')
    """,
)
def achilles_counts_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.achilles_catalog import run_catalog

    read = _pseudo_cdm(spark, sf_dir)
    out = run_catalog(
        spark,
        read,
        analysis_ids=[0, 1, 2, 3, 4, 5, 101, 111, 112, 113, 200, 201, 202, 204, 220],
    )
    return out["achilles_results"]


def _mini_registry():
    """Registry describing the pseudo-CDM, for the DQD sweep queries."""
    from ..core.registry import ColumnSpec as C
    from ..core.registry import SchemaRegistry, TableSpec

    person = TableSpec(
        name="person",
        pk="person_id",
        concept_cols=["gender_concept_id", "race_concept_id", "ethnicity_concept_id"],
        columns=[
            C("person_id", "integer", True),
            C("gender_concept_id", "integer", True),
            C("year_of_birth", "integer", True),
            C("race_concept_id", "integer"),
            C("ethnicity_concept_id", "integer"),
        ],
    )
    visit = TableSpec(
        name="visit_occurrence",
        pk="visit_occurrence_id",
        fks={"person_id": "person"},
        concept_cols=["visit_concept_id"],
        columns=[
            C("visit_occurrence_id", "integer", True),
            C("person_id", "integer", True),
            C("visit_concept_id", "integer", True),
            C("visit_start_date", "date", True),
            C("visit_end_date", "date"),
        ],
    )
    obs = TableSpec(
        name="observation_period",
        fks={"person_id": "person"},
        columns=[
            C("person_id", "integer", True),
            C("observation_period_start_date", "date", True),
            C("observation_period_end_date", "date", True),
        ],
    )
    measurement = TableSpec(
        name="measurement",
        pk="measurement_id",
        fks={"person_id": "person"},
        concept_cols=["measurement_concept_id", "unit_concept_id"],
        columns=[
            C("measurement_id", "integer", True),
            C("person_id", "integer", True),
            C("measurement_concept_id", "integer", True),
            C("measurement_date", "date", True),
            C("value_as_number", "float"),
            C("unit_concept_id", "integer"),
        ],
    )
    condition = TableSpec(
        name="condition_occurrence",
        pk="condition_occurrence_id",
        fks={"person_id": "person"},
        concept_cols=["condition_concept_id"],
        columns=[
            C("condition_occurrence_id", "integer", True),
            C("person_id", "integer", True),
            C("condition_concept_id", "integer", True),
            C("condition_start_date", "date", True),
        ],
    )
    return SchemaRegistry([person, visit, obs, measurement, condition])


# ---- DQD sweep oracle: independently recomputes every check the sweep
# enumerates for the mini registry (names must match the sweep's
# {family}_{table}_{field} convention; values are re-derived in SQL).
_DQ_META_COLS = {
    "person": [
        "person_id",
        "gender_concept_id",
        "year_of_birth",
        "race_concept_id",
        "ethnicity_concept_id",
    ],
    "visit_occurrence": [
        "visit_occurrence_id",
        "person_id",
        "visit_concept_id",
        "visit_start_date",
        "visit_end_date",
    ],
    "observation_period": [
        "person_id",
        "observation_period_start_date",
        "observation_period_end_date",
    ],
    "measurement": [
        "measurement_id",
        "person_id",
        "measurement_concept_id",
        "measurement_date",
        "value_as_number",
        "unit_concept_id",
    ],
    "condition_occurrence": [
        "condition_occurrence_id",
        "person_id",
        "condition_concept_id",
        "condition_start_date",
    ],
}


def _dq_meta_values() -> str:
    rows = []
    for t, cols in _DQ_META_COLS.items():
        rows.append(f"('cdmTable_{t}', 'cdmTable')")
        for c in cols:
            rows.append(f"('cdmField_{t}_{c}', 'cdmField')")
            rows.append(f"('cdmDatatype_{t}_{c}', 'cdmDatatype')")
    return ",\n           ".join(rows)


def _dq_check_sql(
    name: str, family: str, violated: str, frm: str, threshold: float
) -> str:
    if threshold == 0.0:
        failed = "CASE WHEN SUM(__V) > 0 THEN 1 ELSE 0 END"
    elif threshold >= 1.0:
        failed = "0"
    else:
        failed = (
            f"CASE WHEN SUM(__V) / GREATEST(COUNT(*), 1) > {threshold} "
            "THEN 1 ELSE 0 END"
        )
    return f"""
    SELECT '{name}' AS check_name, '{family}' AS check_family,
           CAST(SUM(__V) AS BIGINT) AS num_violated_rows,
           ROUND(SUM(__V) / GREATEST(COUNT(*), 1), 6) AS pct_violated_rows,
           CAST(COUNT(*) AS BIGINT) AS num_denominator_rows,
           {failed} AS failed
    FROM (SELECT CASE WHEN {violated} THEN 1 ELSE 0 END AS __V {frm})
    """


def _dq_pk_sql(name: str, table: str, pk: str) -> str:
    return f"""
    SELECT '{name}' AS check_name, 'isPrimaryKey' AS check_family,
           CAST(COUNT(*) - COUNT(DISTINCT {pk}) AS BIGINT) AS num_violated_rows,
           ROUND((COUNT(*) - COUNT(DISTINCT {pk})) / GREATEST(COUNT(*), 1), 6)
             AS pct_violated_rows,
           CAST(COUNT(*) AS BIGINT) AS num_denominator_rows,
           CASE WHEN COUNT(*) > COUNT(DISTINCT {pk}) THEN 1 ELSE 0 END AS failed
    FROM {table}
    """


def _dq_detail_oracle() -> str:
    req = [
        ("person", c) for c in ("person_id", "gender_concept_id", "year_of_birth")
    ] + [
        ("visit", c)
        for c in (
            "visit_occurrence_id",
            "person_id",
            "visit_concept_id",
            "visit_start_date",
        )
    ] + [
        ("obs", c)
        for c in (
            "person_id",
            "observation_period_start_date",
            "observation_period_end_date",
        )
    ] + [
        ("measurement", c)
        for c in (
            "measurement_id",
            "person_id",
            "measurement_concept_id",
            "measurement_date",
        )
    ] + [
        ("cond", c)
        for c in (
            "condition_occurrence_id",
            "person_id",
            "condition_concept_id",
            "condition_start_date",
        )
    ]
    tname = {
        "person": "person",
        "visit": "visit_occurrence",
        "obs": "observation_period",
        "measurement": "measurement",
        "cond": "condition_occurrence",
    }
    parts = [
        f"""
    SELECT check_name, check_family,
           CAST(0 AS BIGINT) AS num_violated_rows,
           ROUND(0 / 1, 6)  AS pct_violated_rows,
           CAST(1 AS BIGINT) AS num_denominator_rows,
           0 AS failed
    FROM (VALUES {_dq_meta_values()}) t(check_name, check_family)
    """
    ]
    for tbl, c in req:
        parts.append(
            _dq_check_sql(
                f"isRequired_{tname[tbl]}_{c}", "isRequired",
                f"{c} IS NULL", f"FROM {tbl}", 0.0,
            )
        )
    parts.append(_dq_pk_sql("isPrimaryKey_person_person_id", "person", "person_id"))
    parts.append(
        _dq_pk_sql(
            "isPrimaryKey_visit_occurrence_visit_occurrence_id",
            "visit",
            "visit_occurrence_id",
        )
    )
    parts.append(
        _dq_pk_sql(
            "isPrimaryKey_measurement_measurement_id", "measurement",
            "measurement_id",
        )
    )
    parts.append(
        _dq_pk_sql(
            "isPrimaryKey_condition_occurrence_condition_occurrence_id",
            "cond",
            "condition_occurrence_id",
        )
    )
    for tbl in ("visit", "obs", "measurement", "cond"):
        parts.append(
            _dq_check_sql(
                f"isForeignKey_{tname[tbl]}_person_id", "isForeignKey",
                "person_id IS NOT NULL AND __pid IS NULL",
                f"FROM {tbl} LEFT JOIN (SELECT DISTINCT person_id AS __pid "
                f"FROM person) pk ON {tbl}.person_id = pk.__pid",
                0.0,
            )
        )
    parts.append(
        _dq_check_sql(
            "plausibleStartBeforeEnd_visit_occurrence_visit_start_date",
            "plausibleStartBeforeEnd",
            "visit_start_date IS NOT NULL AND visit_end_date IS NOT NULL "
            "AND visit_end_date < visit_start_date",
            "FROM visit", 0.01,
        )
    )
    parts.append(
        _dq_check_sql(
            "plausibleStartBeforeEnd_observation_period_observation_period_start_date",
            "plausibleStartBeforeEnd",
            "observation_period_start_date IS NOT NULL AND "
            "observation_period_end_date IS NOT NULL AND "
            "observation_period_end_date < observation_period_start_date",
            "FROM obs", 0.01,
        )
    )
    parts.append(
        _dq_check_sql(
            "plausibleValueLow_person_year_of_birth", "plausibleValueLow",
            "year_of_birth IS NOT NULL AND year_of_birth < 1850",
            "FROM person", 0.01,
        )
    )
    parts.append(
        _dq_check_sql(
            "plausibleValueHigh_person_year_of_birth", "plausibleValueHigh",
            "year_of_birth IS NOT NULL AND year_of_birth > 2099",
            "FROM person", 0.01,
        )
    )
    for c in ("gender_concept_id", "race_concept_id", "ethnicity_concept_id"):
        parts.append(
            _dq_check_sql(
                f"standardConceptRecordCompleteness_person_{c}",
                "standardConceptRecordCompleteness",
                f"{c} IS NULL OR {c} = 0", "FROM person", 1.0,
            )
        )
    parts.append(
        _dq_check_sql(
            "standardConceptRecordCompleteness_visit_occurrence_visit_concept_id",
            "standardConceptRecordCompleteness",
            "visit_concept_id IS NULL OR visit_concept_id = 0",
            "FROM visit", 1.0,
        )
    )
    for nm, col, tbl in (
        ("measurement", "measurement_concept_id", "measurement"),
        ("measurement", "unit_concept_id", "measurement"),
        ("condition_occurrence", "condition_concept_id", "cond"),
    ):
        parts.append(
            _dq_check_sql(
                f"standardConceptRecordCompleteness_{nm}_{col}",
                "standardConceptRecordCompleteness",
                f"{col} IS NULL OR {col} = 0", f"FROM {tbl}", 1.0,
            )
        )
    parts.append(
        _dq_check_sql(
            "measureValueCompleteness_measurement_value_as_number",
            "measureValueCompleteness",
            "value_as_number IS NULL", "FROM measurement", 1.0,
        )
    )
    # concept-level families (19/19): gender-conditional concepts vs the
    # person's gender; measurement units vs the allowed-unit map
    parts.append(
        _dq_check_sql(
            "plausibleGenderUseDescendants_condition_occurrence_condition_concept_id",
            "plausibleGenderUseDescendants",
            "(cc = 4163261 AND g IS NOT NULL AND g <> 8507) OR "
            "(cc = 4299535 AND g IS NOT NULL AND g <> 8532)",
            "FROM (SELECT c.condition_concept_id AS cc, p.gender_concept_id AS g "
            "FROM cond c LEFT JOIN person p USING (person_id))",
            0.01,
        )
    )
    parts.append(
        _dq_check_sql(
            "plausibleGenderUseDescendants_measurement_measurement_concept_id",
            "plausibleGenderUseDescendants",
            "FALSE",
            "FROM measurement", 0.01,
        )
    )
    parts.append(
        _dq_check_sql(
            "plausibleUnitConceptIds_measurement_measurement_concept_id",
            "plausibleUnitConceptIds",
            "measurement_concept_id IN (3036277, 3025315, 3027018) "
            "AND unit_concept_id IS NOT NULL AND NOT ("
            "(measurement_concept_id = 3036277 AND unit_concept_id = 8582) OR "
            "(measurement_concept_id = 3025315 AND unit_concept_id = 9529) OR "
            "(measurement_concept_id = 3027018 AND unit_concept_id = 8541))",
            "FROM measurement", 0.01,
        )
    )
    for tbl in ("visit", "obs", "measurement", "cond"):
        parts.append(
            _dq_check_sql(
                f"measurePersonCompleteness_{tname[tbl]}",
                "measurePersonCompleteness",
                "__fk IS NULL",
                f"FROM person LEFT JOIN (SELECT DISTINCT person_id AS __fk "
                f"FROM {tbl}) f ON person.person_id = f.__fk",
                1.0,
            )
        )
    return (
        _PSEUDO_CDM_SQL
        + """,
    obs AS (
      SELECT person_id, op_start AS observation_period_start_date,
             op_end AS observation_period_end_date
      FROM op)
    """
        + "\nUNION ALL\n".join(parts)
    )


@register("dq_sweep_detail", oracle=_dq_detail_oracle())
def dq_sweep_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-driven DQD sweep over the pseudo-CDM: every instantiated
    check row (quality/dqd_sweep.py; reference data_quality.py:57-224)."""
    from ..quality.dqd_sweep import run_sweep

    res = run_sweep(spark, _pseudo_cdm(spark, sf_dir), _mini_registry())
    return res.select(
        "check_name",
        "check_family",
        "num_violated_rows",
        "pct_violated_rows",
        "num_denominator_rows",
        "failed",
    )


@register(
    "dq_sweep_summary",
    oracle=f"""
    SELECT check_family,
           CAST(COUNT(*) AS BIGINT)               AS num_checks,
           CAST(SUM(failed) AS BIGINT)            AS num_failed,
           CAST(SUM(num_violated_rows) AS BIGINT) AS total_violated
    FROM ({_dq_detail_oracle()}) detail
    GROUP BY check_family
    """,
)
def dq_sweep_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-family rollup of the sweep (G5-style; data_quality.py:280-320)."""
    detail = dq_sweep_detail(spark, sf_dir)
    return detail.groupBy("check_family").agg(
        F.count(F.lit(1)).cast("long").alias("num_checks"),
        F.sum("failed").cast("long").alias("num_failed"),
        F.sum("num_violated_rows").cast("long").alias("total_violated"),
    )


def _kahn_case_sql() -> tuple[str, str]:
    """SQL CASE expressions for (category, context), generated from the
    same FAMILY_KAHN dict the live dashboard classifies with
    (quality/dashboard.py; reference Kahn rollup data_quality.py:288-299)
    — one source of truth, so the oracle and the server cannot drift."""
    from ..quality.dashboard import FAMILY_KAHN

    cat = " ".join(
        f"WHEN '{fam}' THEN '{v[1]}'" for fam, v in sorted(FAMILY_KAHN.items())
    )
    ctx = " ".join(
        f"WHEN '{fam}' THEN '{v[3]}'" for fam, v in sorted(FAMILY_KAHN.items())
    )
    return (
        f"CASE check_family {cat} ELSE 'Conformance' END",
        f"CASE check_family {ctx} ELSE 'Verification' END",
    )


def _kahn_rollup_oracle() -> str:
    cat, ctx = _kahn_case_sql()
    return f"""
    SELECT {ctx} AS context, {cat} AS category,
           CAST(COUNT(*) AS BIGINT)            AS num_checks,
           CAST(SUM(failed) AS BIGINT)         AS num_failed,
           CAST(SUM(1 - failed) AS BIGINT)     AS num_passed
    FROM ({_dq_detail_oracle()}) detail
    GROUP BY 1, 2
    """


@register("dqd_kahn_rollup", oracle=_kahn_rollup_oracle())
def dqd_kahn_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dashboard's Kahn context x category grid as a query: every
    sweep check classified by FAMILY_KAHN and rolled up to pass/fail
    counts (reference run_selected, data_quality_dashboard.py:395-545;
    Overview rollup data_quality.py:288-318).  The live server's
    ``kahn_grid`` derives its cells from exactly these numbers."""
    from ..quality.dashboard import FAMILY_KAHN

    cat_map = F.create_map(
        *[F.lit(x) for fam, v in sorted(FAMILY_KAHN.items()) for x in (fam, v[1])]
    )
    ctx_map = F.create_map(
        *[F.lit(x) for fam, v in sorted(FAMILY_KAHN.items()) for x in (fam, v[3])]
    )
    detail = dq_sweep_detail(spark, sf_dir)
    return (
        detail.select(
            F.coalesce(ctx_map[F.col("check_family")], F.lit("Verification")).alias(
                "context"
            ),
            F.coalesce(cat_map[F.col("check_family")], F.lit("Conformance")).alias(
                "category"
            ),
            "failed",
        )
        .groupBy("context", "category")
        .agg(
            F.count(F.lit(1)).cast("long").alias("num_checks"),
            F.sum("failed").cast("long").alias("num_failed"),
            F.sum(F.lit(1) - F.col("failed")).cast("long").alias("num_passed"),
        )
    )


# Achilles 109/110: continuous-observation date spines — persons whose
# observation period fully covers each year/month.  Spark derives the
# spine with sequence+explode; DuckDB independently with generate_series.
@register(
    "achilles_continuous_obs",
    oracle=_PSEUDO_CDM_SQL
    + f"""
    SELECT 109 AS analysis_id, CAST(y AS VARCHAR) AS stratum_1, {_PAD},
           CAST(COUNT(DISTINCT person_id) AS BIGINT) AS count_value
    FROM op, UNNEST(generate_series(year(op_start), year(op_end))) AS t(y)
    WHERE op_start <= make_date(y, 1, 1) AND op_end >= make_date(y, 12, 31)
    GROUP BY y
    UNION ALL
    SELECT 110, strftime(m, '%Y%m'), {_PAD},
           CAST(COUNT(DISTINCT person_id) AS BIGINT)
    FROM op,
         UNNEST(generate_series(date_trunc('month', op_start),
                                date_trunc('month', op_end),
                                INTERVAL 1 MONTH)) AS t(m)
    WHERE op_start <= m AND op_end >= last_day(CAST(m AS DATE))
    GROUP BY strftime(m, '%Y%m')
    """,
)
def achilles_continuous_obs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.achilles_catalog import run_catalog

    read = _pseudo_cdm(spark, sf_dir)
    out = run_catalog(spark, read, analysis_ids=[109, 110])
    return out["achilles_results"]


_DIST_STATS = [
    "avg_value",
    "stdev_value",
    "median_value",
    "p10_value",
    "p25_value",
    "p75_value",
    "p90_value",
]

_DIST_ORACLE_STATS = """
           CAST(COUNT(*) AS BIGINT)              AS count_value,
           ROUND(AVG(v), 3)                      AS avg_value,
           ROUND(stddev_samp(v), 3)              AS stdev_value,
           ROUND(quantile_cont(v, 0.50), 3)      AS median_value,
           ROUND(quantile_cont(v, 0.10), 3)      AS p10_value,
           ROUND(quantile_cont(v, 0.25), 3)      AS p25_value,
           ROUND(quantile_cont(v, 0.75), 3)      AS p75_value,
           ROUND(quantile_cont(v, 0.90), 3)      AS p90_value
"""


# Achilles content catalog, distribution shape: ids 104 (age at first
# observation by gender — moved from the catalog's historical slot 102
# to its true public id in r5), 105 (observation length), 203 (visits
# per person), 211 (visit length) → one achilles_results_dist frame.
@register(
    "achilles_dists_catalog",
    oracle=_PSEUDO_CDM_SQL
    + f"""
    SELECT 104 AS analysis_id,
           CAST(p.gender_concept_id AS VARCHAR) AS stratum_1, {_PAD},
           {_DIST_ORACLE_STATS}
    FROM (SELECT person_id, year(op_start) - year_of_birth AS v
          FROM op JOIN person USING (person_id)) sub
    JOIN person p USING (person_id)
    GROUP BY p.gender_concept_id
    UNION ALL
    SELECT 105, CAST(NULL AS VARCHAR), {_PAD}, {_DIST_ORACLE_STATS}
    FROM (SELECT op_end - op_start AS v FROM op)
    UNION ALL
    SELECT 203, CAST(NULL AS VARCHAR), {_PAD}, {_DIST_ORACLE_STATS}
    FROM (SELECT COUNT(*) AS v FROM visit GROUP BY person_id)
    UNION ALL
    SELECT 211, CAST(NULL AS VARCHAR), {_PAD}, {_DIST_ORACLE_STATS}
    FROM (SELECT visit_end_date - visit_start_date AS v FROM visit)
    """,
)
def achilles_dists_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.achilles_catalog import run_catalog

    read = _pseudo_cdm(spark, sf_dir)
    out = run_catalog(spark, read, analysis_ids=[104, 105, 203, 211])
    dist = out["achilles_results_dist"]
    return dist.select(
        "analysis_id",
        *[f"stratum_{i}" for i in range(1, 6)],
        "count_value",
        *[F.round(c, 3).alias(c) for c in _DIST_STATS],
    )


# Public observation-period/visit data-quality + depth slots (round 3):
# 114 periods starting before their person's birth year, 115 persons
# with a reversed period, 116 persons with ≥1 observed day per year by
# gender and age decile, 209 reversed visits.  The zero-violation slots
# still emit their 1-row count (COUNT over the empty filter), so the
# hash proves the zero as well as the shape.
@register(
    "achilles_obs_quality",
    oracle=_PSEUDO_CDM_SQL
    + f"""
    SELECT 114 AS analysis_id, CAST(NULL AS VARCHAR) AS stratum_1, {_PAD},
           CAST(COUNT(*) AS BIGINT) AS count_value
    FROM op JOIN person USING (person_id)
    WHERE year(op_start) < year_of_birth
    UNION ALL
    SELECT 115, CAST(NULL AS VARCHAR), {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM (SELECT DISTINCT person_id FROM op WHERE op_end < op_start)
    UNION ALL
    SELECT 116, CAST(yr AS VARCHAR),
           CAST(gender_concept_id AS VARCHAR) AS stratum_2,
           CAST(decade AS VARCHAR) AS stratum_3,
           CAST(NULL AS VARCHAR) AS stratum_4,
           CAST(NULL AS VARCHAR) AS stratum_5,
           CAST(COUNT(*) AS BIGINT)
    FROM (SELECT DISTINCT o.person_id, o.yr, p.gender_concept_id,
                 CAST(floor((o.yr - p.year_of_birth) / 10.0) AS INTEGER)
                   AS decade
          FROM (SELECT person_id,
                       UNNEST(generate_series(year(op_start), year(op_end)))
                         AS yr
                FROM op) o
          JOIN person p USING (person_id))
    GROUP BY yr, gender_concept_id, decade
    UNION ALL
    SELECT 209, CAST(NULL AS VARCHAR), {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM visit WHERE visit_end_date < visit_start_date
    """,
)
def achilles_obs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.achilles_catalog import run_catalog

    read = _pseudo_cdm(spark, sf_dir)
    out = run_catalog(spark, read, analysis_ids=[114, 115, 116, 209])
    return out["achilles_results"]


# 1818/1819: measurement values below/above the record's normal range.
@register(
    "achilles_measurement_range",
    oracle=_PSEUDO_CDM_SQL
    + f"""
    SELECT 1818 AS analysis_id,
           CAST(measurement_concept_id AS VARCHAR) AS stratum_1, {_PAD},
           CAST(COUNT(*) AS BIGINT) AS count_value
    FROM measurement
    WHERE value_as_number IS NOT NULL AND value_as_number < range_low
    GROUP BY measurement_concept_id
    UNION ALL
    SELECT 1819, CAST(measurement_concept_id AS VARCHAR), {_PAD},
           CAST(COUNT(*) AS BIGINT)
    FROM measurement
    WHERE value_as_number IS NOT NULL AND value_as_number > range_high
    GROUP BY measurement_concept_id
    """,
)
def achilles_measurement_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.achilles_catalog import run_catalog

    read = _pseudo_cdm(spark, sf_dir)
    out = run_catalog(spark, read, analysis_ids=[1818, 1819])
    return out["achilles_results"]


# 213: length-of-stay distribution stratified by visit_concept_id.
@register(
    "achilles_visit_los_dists",
    oracle=_PSEUDO_CDM_SQL
    + f"""
    SELECT 213 AS analysis_id,
           CAST(visit_concept_id AS VARCHAR) AS stratum_1, {_PAD},
           {_DIST_ORACLE_STATS}
    FROM (SELECT visit_concept_id,
                 visit_end_date - visit_start_date AS v FROM visit)
    GROUP BY visit_concept_id
    """,
)
def achilles_visit_los_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.achilles_catalog import run_catalog

    read = _pseudo_cdm(spark, sf_dir)
    out = run_catalog(spark, read, analysis_ids=[213])
    dist = out["achilles_results_dist"]
    return dist.select(
        "analysis_id",
        *[f"stratum_{i}" for i in range(1, 6)],
        "count_value",
        *[F.round(c, 3).alias(c) for c in _DIST_STATS],
    )


def _run_ext_counts(spark: SparkSession, sf_dir: str, ids: list[int]) -> DataFrame:
    from ..quality.achilles_catalog import run_catalog

    out = run_catalog(spark, _pseudo_cdm_ext(spark, sf_dir), analysis_ids=ids)
    return out["achilles_results"]


def _run_ext_dists(spark: SparkSession, sf_dir: str, ids: list[int]) -> DataFrame:
    from ..quality.achilles_catalog import run_catalog

    out = run_catalog(spark, _pseudo_cdm_ext(spark, sf_dir), analysis_ids=ids)
    dist = out["achilles_results_dist"]
    return dist.select(
        "analysis_id",
        *[f"stratum_{i}" for i in range(1, 6)],
        "count_value",
        *[F.round(c, 3).alias(c) for c in _DIST_STATS],
    )


# Location + care-site families (Achilles 11xx/12xx) plus the person
# invalid-FK slots 8/9 — geography strata through dimension joins.
@register(
    "achilles_geo_caresite",
    oracle=_PSEUDO_CDM_SQL
    + _PSEUDO_EXT_SQL
    + f"""
    SELECT 8 AS analysis_id, CAST(NULL AS VARCHAR) AS stratum_1, {_PAD},
           CAST(COUNT(*) AS BIGINT) AS count_value
    FROM person_ext
    WHERE location_id IS NOT NULL
      AND location_id NOT IN (SELECT location_id FROM loc)
    UNION ALL
    SELECT 9, CAST(NULL AS VARCHAR), {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM person_ext
    WHERE care_site_id IS NOT NULL
      AND care_site_id NOT IN (SELECT care_site_id FROM care_site)
    UNION ALL
    SELECT 1100, substr(l.zip, 1, 3), {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM person_ext p JOIN loc l USING (location_id)
    GROUP BY substr(l.zip, 1, 3)
    UNION ALL
    SELECT 1101, l.state, {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM person_ext p JOIN loc l USING (location_id)
    GROUP BY l.state
    UNION ALL
    SELECT 1102, substr(l.zip, 1, 3), {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM care_site cs JOIN loc l USING (location_id)
    GROUP BY substr(l.zip, 1, 3)
    UNION ALL
    SELECT 1103, l.state, {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM care_site cs JOIN loc l USING (location_id)
    GROUP BY l.state
    UNION ALL
    SELECT 1200, CAST(cs.place_of_service_concept_id AS VARCHAR), {_PAD},
           CAST(COUNT(*) AS BIGINT)
    FROM person_ext p JOIN care_site cs USING (care_site_id)
    GROUP BY cs.place_of_service_concept_id
    UNION ALL
    SELECT 1202, CAST(place_of_service_concept_id AS VARCHAR), {_PAD},
           CAST(COUNT(*) AS BIGINT)
    FROM care_site GROUP BY place_of_service_concept_id
    UNION ALL
    SELECT 1203, CAST(NULL AS VARCHAR), {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM care_site
    WHERE location_id IS NOT NULL
      AND location_id NOT IN (SELECT location_id FROM loc)
    """,
)
def achilles_geo_caresite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Achilles location/care_site families over the extended pseudo-CDM
    (quality/achilles_catalog.py 1100-1203; reference runs the same ids
    when the tables exist, etl/achilles.py:54-227)."""
    return _run_ext_counts(
        spark, sf_dir, [8, 9, 1100, 1101, 1102, 1103, 1200, 1202, 1203]
    )


# Person/observation-period depth: 2-strata demographics + the 107/108
# data-quality and 30-day-bucket slots.
@register(
    "achilles_person_depth",
    oracle=_PSEUDO_CDM_SQL
    + f""",
    op2 AS (SELECT person_id, op_start, op_end FROM op)
    SELECT 10 AS analysis_id, CAST(year_of_birth AS VARCHAR) AS stratum_1,
           CAST(gender_concept_id AS VARCHAR) AS stratum_2, {_PAD3},
           CAST(COUNT(*) AS BIGINT) AS count_value
    FROM person GROUP BY year_of_birth, gender_concept_id
    UNION ALL
    SELECT 12, CAST(race_concept_id AS VARCHAR),
           CAST(ethnicity_concept_id AS VARCHAR), {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM person GROUP BY race_concept_id, ethnicity_concept_id
    UNION ALL
    SELECT 107, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM op2 WHERE op_end < op_start
    UNION ALL
    SELECT 108,
           CAST(CAST(floor((op_end - op_start) / 30) AS INTEGER) AS VARCHAR),
           CAST(NULL AS VARCHAR), {_PAD3}, CAST(COUNT(*) AS BIGINT)
    FROM op2 GROUP BY CAST(floor((op_end - op_start) / 30) AS INTEGER)
    """,
)
def achilles_person_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Person 2-strata demographics (10/12) + observation-period 107/108
    (end-before-start, 30-day total-observed buckets)."""
    return _run_ext_counts(spark, sf_dir, [10, 12, 107, 108])


# Payer plan period family (Achilles 14xx): the observation-period set
# mirrored onto insurance coverage periods.
@register(
    "achilles_payer_catalog",
    oracle=_PSEUDO_CDM_SQL
    + _PSEUDO_EXT_SQL
    + f"""
    SELECT 1400 AS analysis_id, CAST(payer_concept_id AS VARCHAR) AS stratum_1,
           {_PAD}, CAST(COUNT(*) AS BIGINT) AS count_value
    FROM (SELECT DISTINCT person_id, payer_concept_id FROM payer)
    GROUP BY payer_concept_id
    UNION ALL
    SELECT 1401, CAST(payer_concept_id AS VARCHAR), {_PAD},
           CAST(COUNT(*) AS BIGINT)
    FROM payer GROUP BY payer_concept_id
    UNION ALL
    SELECT 1402, CAST(payer_concept_id AS VARCHAR),
           CAST(gender_concept_id AS VARCHAR) AS stratum_2, {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM (SELECT DISTINCT pp.person_id, pp.payer_concept_id,
                 p.gender_concept_id
          FROM payer pp JOIN person p USING (person_id))
    GROUP BY payer_concept_id, gender_concept_id
    UNION ALL
    SELECT 1404, CAST(payer_concept_id AS VARCHAR),
           CAST(age_decade AS VARCHAR) AS stratum_2, {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM (SELECT DISTINCT pp.person_id, pp.payer_concept_id,
                 CAST(floor((year(pp.pstart) - p.year_of_birth) / 10)
                      AS INTEGER) AS age_decade
          FROM payer pp JOIN person p USING (person_id))
    GROUP BY payer_concept_id, age_decade
    UNION ALL
    SELECT 1407, CAST(NULL AS VARCHAR), {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM payer WHERE person_id NOT IN (SELECT person_id FROM person)
    UNION ALL
    SELECT 1408, CAST(NULL AS VARCHAR), {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM payer pp
    WHERE NOT EXISTS (SELECT 1 FROM op
                      WHERE op.person_id = pp.person_id
                        AND pp.pstart BETWEEN op.op_start AND op.op_end)
    UNION ALL
    SELECT 1409, CAST(y AS VARCHAR), {_PAD},
           CAST(COUNT(DISTINCT person_id) AS BIGINT)
    FROM payer, UNNEST(generate_series(year(pstart), year(pend))) AS t(y)
    WHERE pstart <= make_date(y, 1, 1) AND pend >= make_date(y, 12, 31)
    GROUP BY y
    UNION ALL
    SELECT 1410, strftime(m, '%Y%m'), {_PAD},
           CAST(COUNT(DISTINCT person_id) AS BIGINT)
    FROM payer,
         UNNEST(generate_series(date_trunc('month', pstart),
                                date_trunc('month', pend),
                                INTERVAL 1 MONTH)) AS t(m)
    WHERE pstart <= m AND pend >= last_day(CAST(m AS DATE))
    GROUP BY strftime(m, '%Y%m')
    UNION ALL
    SELECT 1411, strftime(pstart, '%Y%m'), {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM payer GROUP BY strftime(pstart, '%Y%m')
    UNION ALL
    SELECT 1412, strftime(pend, '%Y%m'), {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM payer GROUP BY strftime(pend, '%Y%m')
    UNION ALL
    SELECT 1413, CAST(cnt AS VARCHAR), {_PAD}, CAST(COUNT(*) AS BIGINT)
    FROM (SELECT person_id, COUNT(*) AS cnt FROM payer GROUP BY person_id)
    GROUP BY cnt
    """,
)
def achilles_payer_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payer plan period counts family (1400-1413): persons/records by
    payer, gender/age-decade strata, continuous-coverage spines,
    start/end months, periods-per-person."""
    return _run_ext_counts(
        spark, sf_dir,
        [1400, 1401, 1402, 1404, 1407, 1408, 1409, 1410, 1411, 1412, 1413],
    )


@register(
    "achilles_payer_dists",
    oracle=_PSEUDO_CDM_SQL
    + _PSEUDO_EXT_SQL
    + f"""
    SELECT 1403 AS analysis_id, CAST(NULL AS VARCHAR) AS stratum_1, {_PAD},
           {_DIST_ORACLE_STATS}
    FROM (SELECT COUNT(*) AS v FROM payer GROUP BY person_id)
    UNION ALL
    SELECT 1406, CAST(payer_concept_id AS VARCHAR), {_PAD},
           {_DIST_ORACLE_STATS}
    FROM (SELECT pp.payer_concept_id, year(pp.pstart) - p.year_of_birth AS v
          FROM payer pp JOIN person p USING (person_id))
    GROUP BY payer_concept_id
    UNION ALL
    SELECT 1415, CAST(NULL AS VARCHAR), {_PAD}, {_DIST_ORACLE_STATS}
    FROM (SELECT pend - pstart AS v FROM payer)
    """,
)
def achilles_payer_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payer plan period distributions (1403/1406/1415): periods per
    person, age at period start by payer, period length days."""
    return _run_ext_dists(spark, sf_dir, [1403, 1406, 1415])


# Visit detail family (Achilles 13xx): the visit set on the finer table.
@register(
    "achilles_visit_detail_catalog",
    oracle=_PSEUDO_CDM_SQL
    + _PSEUDO_EXT_SQL
    + f"""
    SELECT 1300 AS analysis_id,
           CAST(visit_detail_concept_id AS VARCHAR) AS stratum_1, {_PAD},
           CAST(COUNT(*) AS BIGINT) AS count_value
    FROM (SELECT DISTINCT person_id, visit_detail_concept_id FROM vdetail)
    GROUP BY visit_detail_concept_id
    UNION ALL
    SELECT 1301, CAST(visit_detail_concept_id AS VARCHAR), {_PAD},
           CAST(COUNT(*) AS BIGINT)
    FROM vdetail GROUP BY visit_detail_concept_id
    UNION ALL
    SELECT 1302, CAST(visit_detail_concept_id AS VARCHAR),
           CAST(gender_concept_id AS VARCHAR) AS stratum_2, {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM (SELECT DISTINCT v.person_id, v.visit_detail_concept_id,
                 p.gender_concept_id
          FROM vdetail v JOIN person p USING (person_id))
    GROUP BY visit_detail_concept_id, gender_concept_id
    UNION ALL
    SELECT 1304, CAST(visit_detail_concept_id AS VARCHAR),
           CAST(age_decade AS VARCHAR) AS stratum_2, {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM (SELECT DISTINCT v.person_id, v.visit_detail_concept_id,
                 CAST(floor((year(v.vd_start) - p.year_of_birth) / 10)
                      AS INTEGER) AS age_decade
          FROM vdetail v JOIN person p USING (person_id))
    GROUP BY visit_detail_concept_id, age_decade
    UNION ALL
    SELECT 1305, CAST(visit_detail_concept_id AS VARCHAR),
           CAST(visit_detail_type_concept_id AS VARCHAR), {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM vdetail
    GROUP BY visit_detail_concept_id, visit_detail_type_concept_id
    UNION ALL
    SELECT 1307, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM vdetail WHERE person_id NOT IN (SELECT person_id FROM person)
    UNION ALL
    SELECT 1308, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM vdetail v
    WHERE NOT EXISTS (SELECT 1 FROM op
                      WHERE op.person_id = v.person_id
                        AND v.vd_start BETWEEN op.op_start AND op.op_end)
    UNION ALL
    SELECT 1312, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM vdetail
    WHERE visit_occurrence_id IS NOT NULL AND visit_occurrence_id NOT IN
          (SELECT visit_occurrence_id FROM visit)
    UNION ALL
    SELECT 1320, strftime(vd_start, '%Y%m'), CAST(NULL AS VARCHAR), {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM vdetail GROUP BY strftime(vd_start, '%Y%m')
    UNION ALL
    SELECT 1321, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM vdetail
    WHERE care_site_id IS NOT NULL AND care_site_id NOT IN
          (SELECT care_site_id FROM care_site)
    """,
)
def achilles_visit_detail_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visit detail counts family (1300-1321) over the extended
    pseudo-CDM (lineitem⋈orders-derived visit details)."""
    return _run_ext_counts(
        spark, sf_dir,
        [1300, 1301, 1302, 1304, 1305, 1307, 1308, 1312, 1320, 1321],
    )


@register(
    "achilles_visit_detail_dists",
    oracle=_PSEUDO_CDM_SQL
    + _PSEUDO_EXT_SQL
    + f"""
    SELECT 1303 AS analysis_id, CAST(NULL AS VARCHAR) AS stratum_1,
           CAST(NULL AS VARCHAR) AS stratum_2, {_PAD3}, {_DIST_ORACLE_STATS}
    FROM (SELECT COUNT(*) AS v FROM vdetail GROUP BY person_id)
    UNION ALL
    SELECT 1306, CAST(visit_detail_concept_id AS VARCHAR),
           CAST(gender_concept_id AS VARCHAR), {_PAD3}, {_DIST_ORACLE_STATS}
    FROM (SELECT v.visit_detail_concept_id, p.gender_concept_id,
                 year(v.vd_start) - p.year_of_birth AS v
          FROM vdetail v JOIN person p USING (person_id))
    GROUP BY visit_detail_concept_id, gender_concept_id
    UNION ALL
    SELECT 1313, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), {_PAD3},
           {_DIST_ORACLE_STATS}
    FROM (SELECT vd_end - vd_start AS v FROM vdetail)
    """,
)
def achilles_visit_detail_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visit detail distributions (1303/1306/1313)."""
    return _run_ext_dists(spark, sf_dir, [1303, 1306, 1313])


# Cost family (Achilles 15xx): strata counts + paid-amount distributions.
@register(
    "achilles_cost_catalog",
    oracle=_PSEUDO_CDM_SQL
    + _PSEUDO_EXT_SQL
    + f"""
    SELECT 1500 AS analysis_id, cost_domain_id AS stratum_1, {_PAD},
           CAST(COUNT(*) AS BIGINT) AS count_value
    FROM cost GROUP BY cost_domain_id
    UNION ALL
    SELECT 1501, CAST(cost_type_concept_id AS VARCHAR), {_PAD},
           CAST(COUNT(*) AS BIGINT)
    FROM cost GROUP BY cost_type_concept_id
    UNION ALL
    SELECT 1502, CAST(currency_concept_id AS VARCHAR), {_PAD},
           CAST(COUNT(*) AS BIGINT)
    FROM cost GROUP BY currency_concept_id
    UNION ALL
    SELECT 1505, cost_domain_id, CAST(cost_type_concept_id AS VARCHAR),
           {_PAD3}, CAST(COUNT(*) AS BIGINT)
    FROM cost GROUP BY cost_domain_id, cost_type_concept_id
    UNION ALL
    SELECT 1520, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM cost
    WHERE payer_plan_period_id IS NOT NULL AND payer_plan_period_id NOT IN
          (SELECT payer_plan_period_id FROM payer)
    """,
)
def achilles_cost_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost counts family (1500-1520): domain/type/currency strata and
    the invalid payer-plan FK slot."""
    return _run_ext_counts(spark, sf_dir, [1500, 1501, 1502, 1505, 1520])


@register(
    "achilles_cost_dists",
    oracle=_PSEUDO_CDM_SQL
    + _PSEUDO_EXT_SQL
    + f"""
    SELECT 1510 AS analysis_id, CAST(NULL AS VARCHAR) AS stratum_1, {_PAD},
           {_DIST_ORACLE_STATS}
    FROM (SELECT total_charge AS v FROM cost WHERE total_charge IS NOT NULL)
    UNION ALL
    SELECT 1512, CAST(NULL AS VARCHAR), {_PAD}, {_DIST_ORACLE_STATS}
    FROM (SELECT total_paid AS v FROM cost WHERE total_paid IS NOT NULL)
    """,
)
def achilles_cost_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost amount distributions (1510 total_charge, 1512 total_paid)."""
    return _run_ext_dists(spark, sf_dir, [1510, 1512])


@register(
    "achilles_cost_event_dists",
    oracle=_PSEUDO_CDM_SQL
    + _PSEUDO_EXT_SQL
    + f"""
    SELECT 1506 AS analysis_id, CAST(drug_concept_id AS VARCHAR) AS stratum_1,
           {_PAD}, {_DIST_ORACLE_STATS}
    FROM (SELECT d.drug_concept_id, c.total_paid AS v
          FROM cost c JOIN drugex d ON c.cost_event_id = d.drug_exposure_id
          WHERE c.cost_domain_id = 'Drug' AND c.total_paid IS NOT NULL)
    GROUP BY drug_concept_id
    UNION ALL
    SELECT 1507, CAST(procedure_concept_id AS VARCHAR), {_PAD},
           {_DIST_ORACLE_STATS}
    FROM (SELECT p.procedure_concept_id, c.total_paid AS v
          FROM cost c
          JOIN procex p ON c.cost_event_id = p.procedure_occurrence_id
          WHERE c.cost_domain_id = 'Procedure' AND c.total_paid IS NOT NULL)
    GROUP BY procedure_concept_id
    UNION ALL
    SELECT 1508, CAST(drug_concept_id AS VARCHAR), {_PAD},
           {_DIST_ORACLE_STATS}
    FROM (SELECT d.drug_concept_id, c.total_charge AS v
          FROM cost c JOIN drugex d ON c.cost_event_id = d.drug_exposure_id
          WHERE c.cost_domain_id = 'Drug' AND c.total_charge IS NOT NULL)
    GROUP BY drug_concept_id
    UNION ALL
    SELECT 1509, CAST(procedure_concept_id AS VARCHAR), {_PAD},
           {_DIST_ORACLE_STATS}
    FROM (SELECT p.procedure_concept_id, c.total_charge AS v
          FROM cost c
          JOIN procex p ON c.cost_event_id = p.procedure_occurrence_id
          WHERE c.cost_domain_id = 'Procedure' AND c.total_charge IS NOT NULL)
    GROUP BY procedure_concept_id
    """,
)
def achilles_cost_event_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The formerly-excluded 1506-1509 (VERDICT r5 task 4): per-domain
    cost distributions stratified by the COSTED EVENT's concept — cost
    joins its event table through cost_event_id (Drug → drug_exposure's
    drug_concept_id, Procedure → procedure_occurrence's
    procedure_concept_id), closing the 1500-1520 family."""
    return _run_ext_dists(spark, sf_dir, [1506, 1507, 1508, 1509])


# Cohort (17xx) + episode (24xx, CDM 5.4) families.
@register(
    "achilles_cohort_episode",
    oracle=_PSEUDO_CDM_SQL
    + _PSEUDO_EXT_SQL
    + f"""
    SELECT 1700 AS analysis_id,
           CAST(cohort_definition_id AS VARCHAR) AS stratum_1, {_PAD},
           CAST(COUNT(*) AS BIGINT) AS count_value
    FROM cohort GROUP BY cohort_definition_id
    UNION ALL
    SELECT 1701, CAST(cohort_definition_id AS VARCHAR), {_PAD},
           CAST(COUNT(*) AS BIGINT)
    FROM (SELECT DISTINCT cohort_definition_id, subject_id FROM cohort)
    GROUP BY cohort_definition_id
    UNION ALL
    SELECT 2400, CAST(episode_concept_id AS VARCHAR), {_PAD},
           CAST(COUNT(*) AS BIGINT)
    FROM (SELECT DISTINCT person_id, episode_concept_id FROM episode)
    GROUP BY episode_concept_id
    UNION ALL
    SELECT 2401, CAST(episode_concept_id AS VARCHAR), {_PAD},
           CAST(COUNT(*) AS BIGINT)
    FROM episode GROUP BY episode_concept_id
    UNION ALL
    SELECT 2402, CAST(episode_concept_id AS VARCHAR),
           CAST(gender_concept_id AS VARCHAR) AS stratum_2, {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM (SELECT DISTINCT e.person_id, e.episode_concept_id,
                 p.gender_concept_id
          FROM episode e JOIN person p USING (person_id))
    GROUP BY episode_concept_id, gender_concept_id
    UNION ALL
    SELECT 2404, CAST(episode_concept_id AS VARCHAR),
           CAST(age_decade AS VARCHAR) AS stratum_2, {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM (SELECT DISTINCT e.person_id, e.episode_concept_id,
                 CAST(floor((year(e.ep_start) - p.year_of_birth) / 10)
                      AS INTEGER) AS age_decade
          FROM episode e JOIN person p USING (person_id))
    GROUP BY episode_concept_id, age_decade
    UNION ALL
    SELECT 2405, CAST(episode_concept_id AS VARCHAR),
           CAST(episode_type_concept_id AS VARCHAR), {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM episode GROUP BY episode_concept_id, episode_type_concept_id
    UNION ALL
    SELECT 2407, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM episode WHERE person_id NOT IN (SELECT person_id FROM person)
    UNION ALL
    SELECT 2408, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM episode e
    WHERE NOT EXISTS (SELECT 1 FROM op
                      WHERE op.person_id = e.person_id
                        AND e.ep_start BETWEEN op.op_start AND op.op_end)
    UNION ALL
    SELECT 2413, CAST(episode_object_concept_id AS VARCHAR),
           CAST(NULL AS VARCHAR), {_PAD3}, CAST(COUNT(*) AS BIGINT)
    FROM episode GROUP BY episode_object_concept_id
    UNION ALL
    SELECT 2420, strftime(ep_start, '%Y%m'), CAST(NULL AS VARCHAR), {_PAD3},
           CAST(COUNT(*) AS BIGINT)
    FROM episode GROUP BY strftime(ep_start, '%Y%m')
    """,
)
def achilles_cohort_episode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort (1700/1701) + episode (2400-2420) counts families."""
    return _run_ext_counts(
        spark, sf_dir,
        [1700, 1701, 2400, 2401, 2402, 2404, 2405, 2407, 2408, 2413, 2420],
    )


@register(
    "achilles_cohort_episode_dists",
    oracle=_PSEUDO_CDM_SQL
    + _PSEUDO_EXT_SQL
    + f"""
    SELECT 1702 AS analysis_id,
           CAST(cohort_definition_id AS VARCHAR) AS stratum_1, {_PAD},
           {_DIST_ORACLE_STATS}
    FROM (SELECT cohort_definition_id,
                 cohort_end_date - cohort_start_date AS v
          FROM cohort)
    GROUP BY cohort_definition_id
    UNION ALL
    SELECT 2403, CAST(NULL AS VARCHAR), {_PAD}, {_DIST_ORACLE_STATS}
    FROM (SELECT COUNT(*) AS v FROM episode GROUP BY person_id)
    UNION ALL
    SELECT 2406, CAST(episode_concept_id AS VARCHAR), {_PAD},
           {_DIST_ORACLE_STATS}
    FROM (SELECT e.episode_concept_id, year(e.ep_start) - p.year_of_birth AS v
          FROM episode e JOIN person p USING (person_id))
    GROUP BY episode_concept_id
    UNION ALL
    SELECT 2415, CAST(NULL AS VARCHAR), {_PAD}, {_DIST_ORACLE_STATS}
    FROM (SELECT ep_end - ep_start AS v FROM episode)
    """,
)
def achilles_cohort_episode_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort/episode distributions (1702/2403/2406/2415)."""
    return _run_ext_dists(spark, sf_dir, [1702, 2403, 2406, 2415])


@register(
    "achilles_obsperiod_depth_dists",
    oracle=_PSEUDO_CDM_SQL
    + f"""
    SELECT 103 AS analysis_id, CAST(NULL AS VARCHAR) AS stratum_1, {_PAD},
           {_DIST_ORACLE_STATS}
    FROM (SELECT year(op.op_start) - p.year_of_birth AS v
          FROM op JOIN person p USING (person_id))
    UNION ALL
    SELECT 106, CAST(gender_concept_id AS VARCHAR), {_PAD},
           {_DIST_ORACLE_STATS}
    FROM (SELECT p.gender_concept_id, op.op_end - op.op_start AS v
          FROM op JOIN person p USING (person_id))
    GROUP BY gender_concept_id
    """,
)
def achilles_obsperiod_depth_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observation-period depth distributions: 103 (age at first period)
    and 106 (period length by gender)."""
    return _run_ext_dists(spark, sf_dir, [103, 106])


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


# =====================================================================
# Round 4: clinical-domain pseudo-CDM + the drug / procedure / death /
# observation / era / specimen / device / note families under the hard
# oracle signal, plus the round-4 within-family tail slots.
# =====================================================================


def _pseudo_cdm_clinical(spark: SparkSession, sf_dir: str):
    """Clinical-domain extension of the pseudo-CDM: provider, death,
    drug/procedure/observation events, eras, specimen, device_exposure
    and note tables, plus enriched overrides of the base/ext tables
    (visit provider + discharge, observation-period types, payer plan /
    stop-reason, cost paid-amount columns, location county, and
    reversed-date mixes so the end<start slots prove non-zero counts).
    Pure column arithmetic over customer/orders/lineitem/supplier so
    ``_PSEUDO_CLIN_SQL`` derives the identical CDM in DuckDB."""
    ext = _pseudo_cdm_ext(spark, sf_dir)
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "supplier")
    c, o, li, sup = t["customer"], t["orders"], t["lineitem"], t["supplier"]
    k = F.col("o_orderkey")
    odate = F.col("o_orderdate").cast("date")
    sdate = F.col("l_shipdate").cast("date")

    provider = sup.select(
        F.col("s_suppkey").alias("provider_id"),
        (F.lit(38004446) + F.col("s_suppkey") % 5).alias("specialty_concept_id"),
        (F.lit(8507) + F.col("s_suppkey") % 2).alias("gender_concept_id"),
        (
            F.col("s_nationkey") + 1
            + F.when(F.col("s_suppkey") % 53 == 0, 1000).otherwise(0)
        ).alias("care_site_id"),
    )
    visit = (
        ext("visit_occurrence")
        .withColumn("provider_id", F.col("visit_occurrence_id") % 137 + 1)
        .withColumn(
            "discharged_to_concept_id",
            F.lit(8536) + F.col("visit_occurrence_id") % 4,
        )
    )
    obs_period = ext("observation_period").withColumn(
        "period_type_concept_id", F.lit(44814724) + F.col("person_id") % 2
    )
    cid = F.col("condition_occurrence_id")
    condition = (
        ext("condition_occurrence")
        .withColumn(
            "condition_end_date",
            F.date_add(
                F.col("condition_start_date"),
                (
                    (cid % 21) - F.when(cid % 31 == 0, 30).otherwise(0)
                ).cast("int"),
            ),
        )
        .withColumn("condition_status_concept_id", F.lit(32890) + cid % 3)
        .withColumn(
            "visit_occurrence_id",
            cid + F.when(cid % 59 == 0, 900000000).otherwise(0),
        )
    )
    death = c.filter(F.col("c_custkey") % 19 == 0).select(
        (
            F.col("c_custkey")
            + F.when(F.col("c_custkey") % 57 == 0, 10000000).otherwise(0)
        ).alias("person_id"),
        F.date_add(
            F.lit("1997-01-01").cast("date"),
            (F.col("c_custkey") % 365).cast("int"),
        ).alias("death_date"),
        (F.lit(4306655) + F.col("c_custkey") % 3).alias("cause_concept_id"),
        (F.lit(32817) + F.col("c_custkey") % 2).alias("death_type_concept_id"),
    )
    lo = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    drug = lo.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
            "drug_exposure_id"
        ),
        F.col("o_custkey").alias("person_id"),
        (F.lit(1125315) + F.col("l_partkey") % 7).alias("drug_concept_id"),
        sdate.alias("drug_exposure_start_date"),
        F.date_add(
            sdate,
            (
                (F.col("l_linenumber") % 30)
                - F.when(F.col("l_orderkey") % 97 == 0, 45).otherwise(0)
            ).cast("int"),
        ).alias("drug_exposure_end_date"),
        (F.lit(38000177) + F.col("l_suppkey") % 2).alias("drug_type_concept_id"),
        F.when(F.col("l_linenumber") % 6 == 0, F.lit(None).cast("int"))
        .otherwise(F.col("l_quantity").cast("int"))
        .alias("days_supply"),
        F.when(F.col("l_linenumber") % 11 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("l_suppkey") % 5)
        .alias("refills"),
        F.when(F.col("l_partkey") % 13 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("l_quantity").cast("double"))
        .alias("quantity"),
        (F.lit(4132161) + F.col("l_partkey") % 3).alias("route_concept_id"),
        (
            F.col("l_orderkey")
            + F.when(F.col("l_suppkey") % 43 == 0, 900000000).otherwise(0)
        ).alias("visit_occurrence_id"),
        (F.col("l_suppkey") % 137 + 1).alias("provider_id"),
    )
    proc = lo.filter(F.col("l_linenumber") <= 3).select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
            "procedure_occurrence_id"
        ),
        F.col("o_custkey").alias("person_id"),
        (F.lit(4230911) + F.col("l_partkey") % 5).alias("procedure_concept_id"),
        F.date_add(sdate, 2).alias("procedure_date"),
        F.date_add(
            sdate,
            (
                2 + (F.col("l_linenumber") % 3)
                - F.when(F.col("l_orderkey") % 89 == 0, 10).otherwise(0)
            ).cast("int"),
        ).alias("procedure_end_date"),
        (F.lit(38000275) + F.col("l_suppkey") % 2).alias(
            "procedure_type_concept_id"
        ),
        F.when(F.col("l_suppkey") % 7 == 0, F.lit(None).cast("int"))
        .otherwise(F.col("l_quantity").cast("int"))
        .alias("quantity"),
        (F.lit(42739579) + F.col("l_partkey") % 4).alias("modifier_concept_id"),
        (
            F.col("l_orderkey")
            + F.when(F.col("l_partkey") % 41 == 0, 900000000).otherwise(0)
        ).alias("visit_occurrence_id"),
        (F.col("l_partkey") % 137 + 1).alias("provider_id"),
    )
    observation = o.filter(k % 2 == 0).select(
        k.alias("observation_id"),
        F.col("o_custkey").alias("person_id"),
        (F.lit(4275495) + k % 4).alias("observation_concept_id"),
        F.date_add(odate, 3).alias("observation_date"),
        (F.lit(32817) + k % 2).alias("observation_type_concept_id"),
        F.when(k % 3 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice") / 100)
        .alias("value_as_number"),
        F.when(k % 5 == 0, F.lit(45877994) + k % 2)
        .otherwise(F.lit(None).cast("long"))
        .alias("value_as_concept_id"),
        F.when(k % 7 == 0, F.concat(F.lit("obs-"), (k % 3).cast("string")))
        .otherwise(F.lit(None).cast("string"))
        .alias("value_as_string"),
        (k + F.when(k % 71 == 0, 900000000).otherwise(0)).alias(
            "visit_occurrence_id"
        ),
        (k % 137 + 1).alias("provider_id"),
    )
    drug_era = o.select(
        k.alias("drug_era_id"),
        F.col("o_custkey").alias("person_id"),
        (F.lit(1125315) + k % 7).alias("drug_concept_id"),
        odate.alias("drug_era_start_date"),
        F.date_add(
            odate,
            ((k % 180) - F.when(k % 83 == 0, 200).otherwise(0)).cast("int"),
        ).alias("drug_era_end_date"),
        (k % 5 + 1).alias("drug_exposure_count"),
        F.when(k % 9 == 0, F.lit(None).cast("int"))
        .otherwise((k % 30).cast("int"))
        .alias("gap_days"),
    )
    cond_era = o.filter(k % 3 != 2).select(
        k.alias("condition_era_id"),
        F.col("o_custkey").alias("person_id"),
        (F.lit(201826) + k % 5).alias("condition_concept_id"),
        F.date_add(odate, 1).alias("condition_era_start_date"),
        F.date_add(
            odate,
            (1 + (k % 120) - F.when(k % 79 == 0, 150).otherwise(0)).cast("int"),
        ).alias("condition_era_end_date"),
        (k % 4 + 1).alias("condition_occurrence_count"),
    )
    specimen = lo.filter(F.col("l_linenumber") == 1).select(
        F.col("l_orderkey").alias("specimen_id"),
        F.col("o_custkey").alias("person_id"),
        (F.lit(4122248) + F.col("l_partkey") % 3).alias("specimen_concept_id"),
        F.lit(581378).alias("specimen_type_concept_id"),
        sdate.alias("specimen_date"),
        F.when(F.col("l_partkey") % 13 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("l_quantity").cast("double"))
        .alias("quantity"),
        (F.lit(8576) + F.col("l_suppkey") % 2).alias("unit_concept_id"),
        (F.lit(4103420) + F.col("l_suppkey") % 4).alias(
            "anatomic_site_concept_id"
        ),
        (F.lit(4066212) + F.col("l_partkey") % 2).alias(
            "disease_status_concept_id"
        ),
    )
    device = lo.filter(F.col("l_linenumber") == 2).select(
        F.col("l_orderkey").alias("device_exposure_id"),
        F.col("o_custkey").alias("person_id"),
        (F.lit(4263759) + F.col("l_partkey") % 4).alias("device_concept_id"),
        sdate.alias("device_exposure_start_date"),
        F.date_add(
            sdate,
            (
                (F.col("l_suppkey") % 10)
                - F.when(F.col("l_orderkey") % 61 == 0, 20).otherwise(0)
            ).cast("int"),
        ).alias("device_exposure_end_date"),
        (F.lit(44818707) + F.col("l_partkey") % 2).alias(
            "device_type_concept_id"
        ),
        F.when(F.col("l_suppkey") % 11 == 0, F.lit(None).cast("int"))
        .otherwise(F.col("l_quantity").cast("int"))
        .alias("quantity"),
        (
            F.col("l_orderkey")
            + F.when(F.col("l_partkey") % 37 == 0, 900000000).otherwise(0)
        ).alias("visit_occurrence_id"),
        (F.col("l_suppkey") % 137 + 1).alias("provider_id"),
    )
    note = o.filter(k % 2 == 1).select(
        k.alias("note_id"),
        F.col("o_custkey").alias("person_id"),
        odate.alias("note_date"),
        (F.lit(44814645) + k % 3).alias("note_class_concept_id"),
        (F.lit(44814641) + k % 2).alias("note_type_concept_id"),
        (F.lit(32678) + k % 2).alias("encoding_concept_id"),
        (F.lit(4180186) + k % 2).alias("language_concept_id"),
        (k + F.when(k % 67 == 0, 900000000).otherwise(0)).alias(
            "visit_occurrence_id"
        ),
        (k % 137 + 1).alias("provider_id"),
    )
    location = ext("location").withColumn(
        "county", F.concat(F.lit("C"), (F.col("location_id") % 7).cast("string"))
    )
    pid = F.col("payer_plan_period_id")
    payer = (
        ext("payer_plan_period")
        .withColumn("plan_concept_id", F.lit(45880001) + pid % 3)
        .withColumn("stop_reason_concept_id", F.lit(44786665) + pid % 2)
        .withColumn(
            "payer_plan_period_end_date",
            F.when(
                pid % 73 == 0,
                F.date_add(F.col("payer_plan_period_start_date"), -10),
            ).otherwise(F.col("payer_plan_period_end_date")),
        )
    )
    tc = F.col("total_charge")
    cost = (
        ext("cost")
        .withColumn(
            "paid_patient_copay",
            F.when(F.col("cost_id") % 4 == 0, F.lit(None).cast("double"))
            .otherwise(tc * 0.1),
        )
        .withColumn(
            "paid_patient_coinsurance",
            F.when(F.col("cost_id") % 5 == 0, F.lit(None).cast("double"))
            .otherwise(tc * 0.2),
        )
        .withColumn(
            "paid_patient_deductible",
            F.when(F.col("cost_id") % 6 == 0, F.lit(None).cast("double"))
            .otherwise(tc * 0.05),
        )
        .withColumn(
            "paid_ingredient_cost",
            F.when(F.col("cost_id") % 7 == 0, F.lit(None).cast("double"))
            .otherwise(tc * 0.3),
        )
    )
    cstart = F.date_add(
        F.lit("1995-01-01").cast("date"), (F.col("c_custkey") % 1000).cast("int")
    )
    cohort = ext("cohort").unionByName(
        c.filter(F.col("c_custkey") % 13 == 0).select(
            (F.col("c_custkey") % 3).alias("cohort_definition_id"),
            F.col("c_custkey").alias("subject_id"),
            cstart.alias("cohort_start_date"),
            F.date_add(cstart, -5).alias("cohort_end_date"),
        )
    )
    vd = ext("visit_detail").withColumn(
        "discharged_to_concept_id", F.lit(8536) + F.col("visit_detail_id") % 3
    )
    episode = ext("episode").withColumn(
        "episode_end_date",
        F.when(
            F.col("episode_id") % 53 == 0,
            F.date_add(F.col("episode_start_date"), -7),
        ).otherwise(F.col("episode_end_date")),
    )
    extra = {
        "provider": provider,
        "visit_occurrence": visit,
        "observation_period": obs_period,
        "condition_occurrence": condition,
        "death": death,
        "drug_exposure": drug,
        "procedure_occurrence": proc,
        "observation": observation,
        "drug_era": drug_era,
        "condition_era": cond_era,
        "specimen": specimen,
        "device_exposure": device,
        "note": note,
        "location": location,
        "payer_plan_period": payer,
        "cost": cost,
        "cohort": cohort,
        "visit_detail": vd,
        "episode": episode,
    }
    return lambda name: extra[name] if name in extra else ext(name)


# DuckDB CTEs deriving the identical clinical pseudo-CDM (appended to
# _PSEUDO_CDM_SQL + _PSEUDO_EXT_SQL).
_PSEUDO_CLIN_SQL = """,
    provider AS (
      SELECT s_suppkey AS provider_id,
             38004446 + (s_suppkey % 5) AS specialty_concept_id,
             8507 + (s_suppkey % 2)     AS gender_concept_id,
             (s_nationkey + 1)
               + CASE WHEN s_suppkey % 53 = 0 THEN 1000 ELSE 0 END
               AS care_site_id
      FROM supplier),
    visit_clin AS (
      SELECT v.*, (visit_occurrence_id % 137) + 1 AS provider_id,
             8536 + (visit_occurrence_id % 4) AS discharged_to_concept_id
      FROM visit v),
    op_clin AS (
      SELECT op.*, 44814724 + (person_id % 2) AS period_type_concept_id
      FROM op),
    cond_clin AS (
      SELECT cond.*,
             condition_start_date
               + CAST((condition_occurrence_id % 21)
                      - CASE WHEN condition_occurrence_id % 31 = 0
                             THEN 30 ELSE 0 END AS INTEGER)
               AS condition_end_date,
             32890 + (condition_occurrence_id % 3)
               AS condition_status_concept_id,
             condition_occurrence_id
               + CASE WHEN condition_occurrence_id % 59 = 0
                      THEN 900000000 ELSE 0 END AS visit_occurrence_id
      FROM cond),
    death_t AS (
      SELECT c_custkey + CASE WHEN c_custkey % 57 = 0
                              THEN 10000000 ELSE 0 END AS person_id,
             DATE '1997-01-01' + CAST(c_custkey % 365 AS INTEGER)
               AS death_date,
             4306655 + (c_custkey % 3) AS cause_concept_id,
             32817 + (c_custkey % 2)   AS death_type_concept_id
      FROM customer WHERE c_custkey % 19 = 0),
    drug AS (
      SELECT l_orderkey * 10 + l_linenumber AS drug_exposure_id,
             o_custkey AS person_id,
             1125315 + (l_partkey % 7) AS drug_concept_id,
             CAST(l_shipdate AS DATE)  AS drug_exposure_start_date,
             CAST(l_shipdate AS DATE)
               + CAST((l_linenumber % 30)
                      - CASE WHEN l_orderkey % 97 = 0 THEN 45 ELSE 0 END
                      AS INTEGER) AS drug_exposure_end_date,
             38000177 + (l_suppkey % 2) AS drug_type_concept_id,
             CASE WHEN l_linenumber % 6 = 0 THEN NULL
                  ELSE CAST(l_quantity AS INTEGER) END AS days_supply,
             CASE WHEN l_linenumber % 11 = 0 THEN NULL
                  ELSE l_suppkey % 5 END AS refills,
             CASE WHEN l_partkey % 13 = 0 THEN NULL
                  ELSE CAST(l_quantity AS DOUBLE) END AS quantity,
             4132161 + (l_partkey % 3) AS route_concept_id,
             l_orderkey + CASE WHEN l_suppkey % 43 = 0
                               THEN 900000000 ELSE 0 END
               AS visit_occurrence_id,
             (l_suppkey % 137) + 1 AS provider_id
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    proc AS (
      SELECT l_orderkey * 10 + l_linenumber AS procedure_occurrence_id,
             o_custkey AS person_id,
             4230911 + (l_partkey % 5) AS procedure_concept_id,
             CAST(l_shipdate AS DATE) + 2 AS procedure_date,
             CAST(l_shipdate AS DATE)
               + CAST(2 + (l_linenumber % 3)
                      - CASE WHEN l_orderkey % 89 = 0 THEN 10 ELSE 0 END
                      AS INTEGER) AS procedure_end_date,
             38000275 + (l_suppkey % 2) AS procedure_type_concept_id,
             CASE WHEN l_suppkey % 7 = 0 THEN NULL
                  ELSE CAST(l_quantity AS INTEGER) END AS quantity,
             42739579 + (l_partkey % 4) AS modifier_concept_id,
             l_orderkey + CASE WHEN l_partkey % 41 = 0
                               THEN 900000000 ELSE 0 END
               AS visit_occurrence_id,
             (l_partkey % 137) + 1 AS provider_id
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_linenumber <= 3),
    obs_t AS (
      SELECT o_orderkey AS observation_id,
             o_custkey  AS person_id,
             4275495 + (o_orderkey % 4) AS observation_concept_id,
             CAST(o_orderdate AS DATE) + 3 AS observation_date,
             32817 + (o_orderkey % 2) AS observation_type_concept_id,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL
                  ELSE o_totalprice / 100 END AS value_as_number,
             CASE WHEN o_orderkey % 5 = 0 THEN 45877994 + (o_orderkey % 2)
                  ELSE NULL END AS value_as_concept_id,
             CASE WHEN o_orderkey % 7 = 0
                  THEN 'obs-' || CAST(o_orderkey % 3 AS VARCHAR)
                  ELSE NULL END AS value_as_string,
             o_orderkey + CASE WHEN o_orderkey % 71 = 0
                               THEN 900000000 ELSE 0 END
               AS visit_occurrence_id,
             (o_orderkey % 137) + 1 AS provider_id
      FROM orders WHERE o_orderkey % 2 = 0),
    drug_era AS (
      SELECT o_orderkey AS drug_era_id,
             o_custkey  AS person_id,
             1125315 + (o_orderkey % 7) AS drug_concept_id,
             CAST(o_orderdate AS DATE)  AS drug_era_start_date,
             CAST(o_orderdate AS DATE)
               + CAST((o_orderkey % 180)
                      - CASE WHEN o_orderkey % 83 = 0 THEN 200 ELSE 0 END
                      AS INTEGER) AS drug_era_end_date,
             (o_orderkey % 5) + 1 AS drug_exposure_count,
             CASE WHEN o_orderkey % 9 = 0 THEN NULL
                  ELSE CAST(o_orderkey % 30 AS INTEGER) END AS gap_days
      FROM orders),
    cond_era AS (
      SELECT o_orderkey AS condition_era_id,
             o_custkey  AS person_id,
             201826 + (o_orderkey % 5) AS condition_concept_id,
             CAST(o_orderdate AS DATE) + 1 AS condition_era_start_date,
             CAST(o_orderdate AS DATE)
               + CAST(1 + (o_orderkey % 120)
                      - CASE WHEN o_orderkey % 79 = 0 THEN 150 ELSE 0 END
                      AS INTEGER) AS condition_era_end_date,
             (o_orderkey % 4) + 1 AS condition_occurrence_count
      FROM orders WHERE o_orderkey % 3 != 2),
    specimen_t AS (
      SELECT l_orderkey AS specimen_id,
             o_custkey  AS person_id,
             4122248 + (l_partkey % 3) AS specimen_concept_id,
             581378 AS specimen_type_concept_id,
             CAST(l_shipdate AS DATE) AS specimen_date,
             CASE WHEN l_partkey % 13 = 0 THEN NULL
                  ELSE CAST(l_quantity AS DOUBLE) END AS quantity,
             8576 + (l_suppkey % 2)    AS unit_concept_id,
             4103420 + (l_suppkey % 4) AS anatomic_site_concept_id,
             4066212 + (l_partkey % 2) AS disease_status_concept_id
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_linenumber = 1),
    device_t AS (
      SELECT l_orderkey AS device_exposure_id,
             o_custkey  AS person_id,
             4263759 + (l_partkey % 4) AS device_concept_id,
             CAST(l_shipdate AS DATE)  AS device_exposure_start_date,
             CAST(l_shipdate AS DATE)
               + CAST((l_suppkey % 10)
                      - CASE WHEN l_orderkey % 61 = 0 THEN 20 ELSE 0 END
                      AS INTEGER) AS device_exposure_end_date,
             44818707 + (l_partkey % 2) AS device_type_concept_id,
             CASE WHEN l_suppkey % 11 = 0 THEN NULL
                  ELSE CAST(l_quantity AS INTEGER) END AS quantity,
             l_orderkey + CASE WHEN l_partkey % 37 = 0
                               THEN 900000000 ELSE 0 END
               AS visit_occurrence_id,
             (l_suppkey % 137) + 1 AS provider_id
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_linenumber = 2),
    note_t AS (
      SELECT o_orderkey AS note_id,
             o_custkey  AS person_id,
             CAST(o_orderdate AS DATE) AS note_date,
             44814645 + (o_orderkey % 3) AS note_class_concept_id,
             44814641 + (o_orderkey % 2) AS note_type_concept_id,
             32678 + (o_orderkey % 2)    AS encoding_concept_id,
             4180186 + (o_orderkey % 2)  AS language_concept_id,
             o_orderkey + CASE WHEN o_orderkey % 67 = 0
                               THEN 900000000 ELSE 0 END
               AS visit_occurrence_id,
             (o_orderkey % 137) + 1 AS provider_id
      FROM orders WHERE o_orderkey % 2 = 1),
    loc_clin AS (
      SELECT loc.*, 'C' || CAST(location_id % 7 AS VARCHAR) AS county
      FROM loc),
    payer_clin AS (
      SELECT payer_plan_period_id, person_id, pstart,
             CASE WHEN payer_plan_period_id % 73 = 0
                  THEN pstart - 10 ELSE pend END AS pend,
             payer_concept_id,
             45880001 + (payer_plan_period_id % 3) AS plan_concept_id,
             44786665 + (payer_plan_period_id % 2) AS stop_reason_concept_id
      FROM payer),
    cost_clin AS (
      SELECT cost.*,
             CASE WHEN cost_id % 4 = 0 THEN NULL
                  ELSE total_charge * 0.1 END AS paid_patient_copay,
             CASE WHEN cost_id % 5 = 0 THEN NULL
                  ELSE total_charge * 0.2 END AS paid_patient_coinsurance,
             CASE WHEN cost_id % 6 = 0 THEN NULL
                  ELSE total_charge * 0.05 END AS paid_patient_deductible,
             CASE WHEN cost_id % 7 = 0 THEN NULL
                  ELSE total_charge * 0.3 END AS paid_ingredient_cost
      FROM cost),
    cohort_clin AS (
      SELECT * FROM cohort
      UNION ALL
      SELECT c_custkey % 3, c_custkey,
             DATE '1995-01-01' + CAST(c_custkey % 1000 AS INTEGER),
             DATE '1995-01-01' + CAST(c_custkey % 1000 AS INTEGER) - 5
      FROM customer WHERE c_custkey % 13 = 0),
    vd_clin AS (
      SELECT vdetail.*, 8536 + (visit_detail_id % 3)
               AS discharged_to_concept_id
      FROM vdetail),
    episode_clin AS (
      SELECT episode_id, person_id, episode_concept_id, ep_start,
             CASE WHEN episode_id % 53 = 0 THEN ep_start - 7 ELSE ep_end END
               AS ep_end,
             episode_object_concept_id, episode_type_concept_id
      FROM episode)
"""

_CLIN_SQL = _PSEUDO_CDM_SQL + _PSEUDO_EXT_SQL + _PSEUDO_CLIN_SQL


def _frag_count(aid: int, frm: str, strata=(), where: str | None = None) -> str:
    """One counts-shape oracle member: SELECT analysis_id, stratum_1..5
    (strata expressions CAST to VARCHAR, padded with NULLs), bigint
    count — mirroring counts_analysis / the grouping-sets merge."""
    cols = []
    for i in range(5):
        expr = f"CAST({strata[i]} AS VARCHAR)" if i < len(strata) else "CAST(NULL AS VARCHAR)"
        cols.append(f"{expr} AS stratum_{i + 1}")
    sel = ", ".join(cols)
    w = f" WHERE {where}" if where else ""
    g = (" GROUP BY " + ", ".join(strata)) if strata else ""
    return (
        f"SELECT {aid} AS analysis_id, {sel}, "
        f"CAST(COUNT(*) AS BIGINT) AS count_value FROM {frm}{w}{g}"
    )


def _frag_dist(aid: int, frm: str, strata=()) -> str:
    """One dist-shape oracle member over a subquery exposing ``v`` (and
    the strata columns) — mirroring dist_analysis + the round(3)
    projection of the dist runners."""
    cols = []
    for i in range(5):
        expr = f"CAST({strata[i]} AS VARCHAR)" if i < len(strata) else "CAST(NULL AS VARCHAR)"
        cols.append(f"{expr} AS stratum_{i + 1}")
    sel = ", ".join(cols)
    g = (" GROUP BY " + ", ".join(strata)) if strata else ""
    return (
        f"SELECT {aid} AS analysis_id, {sel}, {_DIST_ORACLE_STATS} FROM {frm}{g}"
    )


def _clin_oracle(*frags: str) -> str:
    return _CLIN_SQL + "\n    " + "\n    UNION ALL\n    ".join(frags)


def _run_clin_counts(spark: SparkSession, sf_dir: str, ids: list[int]) -> DataFrame:
    from ..quality.achilles_catalog import run_catalog

    out = run_catalog(
        spark, _pseudo_cdm_clinical(spark, sf_dir), analysis_ids=ids
    )
    return out["achilles_results"]


def _run_clin_dists(spark: SparkSession, sf_dir: str, ids: list[int]) -> DataFrame:
    from ..quality.achilles_catalog import run_catalog

    out = run_catalog(
        spark, _pseudo_cdm_clinical(spark, sf_dir), analysis_ids=ids
    )
    dist = out["achilles_results_dist"]
    return dist.select(
        "analysis_id",
        *[f"stratum_{i}" for i in range(1, 6)],
        "count_value",
        *[F.round(c, 3).alias(c) for c in _DIST_STATS],
    )


_NOT_IN_PERSON = "person_id NOT IN (SELECT person_id FROM person)"
_BAD_PROVIDER = (
    "provider_id IS NOT NULL "
    "AND provider_id NOT IN (SELECT provider_id FROM provider)"
)
_BAD_VISIT = (
    "visit_occurrence_id IS NOT NULL "
    "AND visit_occurrence_id NOT IN (SELECT visit_occurrence_id FROM visit)"
)


def _outside_op(alias: str, date_col: str) -> str:
    return (
        f"{alias}.{date_col} IS NOT NULL AND NOT EXISTS "
        f"(SELECT 1 FROM op WHERE op.person_id = {alias}.person_id "
        f"AND {alias}.{date_col} BETWEEN op.op_start AND op.op_end)"
    )


def _domain_count_frags(
    base: int, cte: str, concept: str, date: str, type_col: str, month_id: int
) -> list[str]:
    """The standard x00/x01/x02/x04/x05/x07/x08/x20 oracle members every
    clinical domain shares (mirrors _domain_specs)."""
    return [
        _frag_count(
            base,
            f"(SELECT DISTINCT person_id, {concept} FROM {cte})",
            [concept],
        ),
        _frag_count(base + 1, cte, [concept]),
        _frag_count(
            base + 2,
            f"(SELECT DISTINCT d.person_id, d.{concept}, p.gender_concept_id "
            f"FROM {cte} d JOIN person p USING (person_id))",
            [concept, "gender_concept_id"],
        ),
        _frag_count(
            base + 4,
            f"(SELECT DISTINCT d.person_id, d.{concept}, "
            f"CAST(floor((year(d.{date}) - p.year_of_birth) / 10) AS INTEGER) "
            f"AS decade FROM {cte} d JOIN person p USING (person_id) "
            f"WHERE d.{date} IS NOT NULL)",
            [concept, "decade"],
        ),
        _frag_count(base + 5, cte, [concept, type_col]),
        _frag_count(base + 7, cte, where=_NOT_IN_PERSON),
        _frag_count(base + 8, f"{cte} d", where=_outside_op("d", date)),
        _frag_count(month_id, cte, [f"strftime({date}, '%Y%m')"]),
    ]


# --- drug_exposure family under the oracle (700-720) ------------------
@register(
    "achilles_drug_catalog",
    oracle=_clin_oracle(
        *_domain_count_frags(
            700, "drug", "drug_concept_id", "drug_exposure_start_date",
            "drug_type_concept_id", 720,
        ),
        _frag_count(
            709, "drug",
            where="drug_exposure_end_date < drug_exposure_start_date",
        ),
        _frag_count(711, "drug", where=_BAD_PROVIDER),
        _frag_count(712, "drug", where=_BAD_VISIT),
        _frag_count(718, "drug", ["route_concept_id"]),
    ),
)
def achilles_drug_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Achilles drug_exposure counts family (catalog 700-720) over the
    clinical pseudo-CDM (reference runs the same ids when the table
    exists, /root/reference/src/riab/etl/achilles.py:54-227)."""
    return _run_clin_counts(
        spark, sf_dir,
        [700, 701, 702, 704, 705, 707, 708, 709, 711, 712, 718, 720],
    )


@register(
    "achilles_drug_dists",
    oracle=_clin_oracle(
        _frag_dist(
            703,
            "(SELECT CAST(COUNT(*) AS BIGINT) AS v FROM drug GROUP BY person_id)",
        ),
        _frag_dist(
            706,
            "(SELECT d.drug_concept_id, year(d.drug_exposure_start_date) "
            "- p.year_of_birth AS v FROM drug d JOIN person p USING (person_id) "
            "WHERE d.drug_exposure_start_date IS NOT NULL)",
            ["drug_concept_id"],
        ),
        _frag_dist(
            715,
            "(SELECT drug_concept_id, days_supply AS v FROM drug "
            "WHERE days_supply IS NOT NULL)",
            ["drug_concept_id"],
        ),
        _frag_dist(
            716,
            "(SELECT drug_concept_id, refills AS v FROM drug "
            "WHERE refills IS NOT NULL)",
            ["drug_concept_id"],
        ),
        _frag_dist(
            717,
            "(SELECT drug_concept_id, quantity AS v FROM drug "
            "WHERE quantity IS NOT NULL)",
            ["drug_concept_id"],
        ),
        _frag_dist(
            719,
            "(SELECT drug_exposure_end_date - drug_exposure_start_date AS v "
            "FROM drug)",
        ),
    ),
)
def achilles_drug_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drug days-supply/refills/quantity/duration distributions
    (catalog 703/706/715-717/719)."""
    return _run_clin_dists(spark, sf_dir, [703, 706, 715, 716, 717, 719])


# --- procedure_occurrence family (600-620) ----------------------------
@register(
    "achilles_procedure_catalog",
    oracle=_clin_oracle(
        *_domain_count_frags(
            600, "proc", "procedure_concept_id", "procedure_date",
            "procedure_type_concept_id", 620,
        ),
        _frag_count(
            609, "proc", where="procedure_end_date < procedure_date"
        ),
        _frag_count(611, "proc", where=_BAD_PROVIDER),
        _frag_count(612, "proc", where=_BAD_VISIT),
        _frag_count(616, "proc", ["modifier_concept_id"]),
    ),
)
def achilles_procedure_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Achilles procedure_occurrence counts family (600-620)."""
    return _run_clin_counts(
        spark, sf_dir,
        [600, 601, 602, 604, 605, 607, 608, 609, 611, 612, 616, 620],
    )


@register(
    "achilles_procedure_dists",
    oracle=_clin_oracle(
        _frag_dist(
            603,
            "(SELECT CAST(COUNT(*) AS BIGINT) AS v FROM proc GROUP BY person_id)",
        ),
        _frag_dist(
            606,
            "(SELECT d.procedure_concept_id, year(d.procedure_date) "
            "- p.year_of_birth AS v FROM proc d JOIN person p USING (person_id) "
            "WHERE d.procedure_date IS NOT NULL)",
            ["procedure_concept_id"],
        ),
        _frag_dist(
            615,
            "(SELECT procedure_concept_id, quantity AS v FROM proc "
            "WHERE quantity IS NOT NULL)",
            ["procedure_concept_id"],
        ),
    ),
)
def achilles_procedure_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procedure per-person/age/quantity distributions (603/606/615)."""
    return _run_clin_dists(spark, sf_dir, [603, 606, 615])


# --- provider + death families (300-306, 500-505) ---------------------
@register(
    "achilles_provider_death",
    oracle=_clin_oracle(
        _frag_count(300, "provider"),
        _frag_count(301, "provider", ["specialty_concept_id"]),
        _frag_count(302, "provider", ["gender_concept_id"]),
        _frag_count(
            303, "provider",
            where="care_site_id IS NOT NULL AND care_site_id NOT IN "
            "(SELECT care_site_id FROM care_site)",
        ),
        _frag_count(
            304, "provider", ["specialty_concept_id", "gender_concept_id"]
        ),
        _frag_count(
            305,
            "(SELECT DISTINCT v.person_id, pr.specialty_concept_id "
            "FROM visit_clin v JOIN provider pr ON v.provider_id = pr.provider_id)",
            ["specialty_concept_id"],
        ),
        _frag_count(
            306,
            "(SELECT pr.specialty_concept_id FROM visit_clin v "
            "JOIN provider pr ON v.provider_id = pr.provider_id)",
            ["specialty_concept_id"],
        ),
        _frag_count(500, "death_t", ["cause_concept_id"]),
        _frag_count(501, "death_t", ["death_type_concept_id"]),
        _frag_count(502, "death_t", ["strftime(death_date, '%Y%m')"]),
        _frag_count(504, "death_t", where=_NOT_IN_PERSON),
        _frag_count(505, "death_t d", where=_outside_op("d", "death_date")),
    ),
)
def achilles_provider_death(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provider specialty/gender strata (300-306) + death family
    (500-505) counts."""
    return _run_clin_counts(
        spark, sf_dir,
        [300, 301, 302, 303, 304, 305, 306, 500, 501, 502, 504, 505],
    )


# --- observation family (800-820) -------------------------------------
@register(
    "achilles_observation_catalog",
    oracle=_clin_oracle(
        *_domain_count_frags(
            800, "obs_t", "observation_concept_id", "observation_date",
            "observation_type_concept_id", 820,
        ),
        _frag_count(811, "obs_t", where=_BAD_PROVIDER),
        _frag_count(
            812, "obs_t",
            where="value_as_number IS NULL AND value_as_string IS NULL "
            "AND value_as_concept_id IS NULL",
        ),
        _frag_count(813, "obs_t", where=_BAD_VISIT),
        _frag_count(814, "obs_t", ["value_as_concept_id"]),
    ),
)
def achilles_observation_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Achilles observation counts family (800-820) incl. the no-value
    and value-concept slots."""
    return _run_clin_counts(
        spark, sf_dir,
        [800, 801, 802, 804, 805, 807, 808, 811, 812, 813, 814, 820],
    )


@register(
    "achilles_observation_dists",
    oracle=_clin_oracle(
        _frag_dist(
            803,
            "(SELECT CAST(COUNT(*) AS BIGINT) AS v FROM obs_t GROUP BY person_id)",
        ),
        _frag_dist(
            806,
            "(SELECT d.observation_concept_id, year(d.observation_date) "
            "- p.year_of_birth AS v FROM obs_t d JOIN person p USING (person_id) "
            "WHERE d.observation_date IS NOT NULL)",
            ["observation_concept_id"],
        ),
        _frag_dist(
            815,
            "(SELECT observation_concept_id, value_as_number AS v FROM obs_t "
            "WHERE value_as_number IS NOT NULL)",
            ["observation_concept_id"],
        ),
    ),
)
def achilles_observation_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observation per-person/age/value distributions (803/806/815)."""
    return _run_clin_dists(spark, sf_dir, [803, 806, 815])


# --- era families (900-920, 1000-1020) --------------------------------
@register(
    "achilles_era_catalog",
    oracle=_clin_oracle(
        _frag_count(
            900,
            "(SELECT DISTINCT person_id, drug_concept_id FROM drug_era)",
            ["drug_concept_id"],
        ),
        _frag_count(901, "drug_era", ["drug_concept_id"]),
        _frag_count(
            902,
            "(SELECT DISTINCT d.person_id, d.drug_concept_id, "
            "p.gender_concept_id FROM drug_era d JOIN person p USING (person_id))",
            ["drug_concept_id", "gender_concept_id"],
        ),
        _frag_count(
            904,
            "(SELECT DISTINCT d.person_id, d.drug_concept_id, "
            "CAST(floor((year(d.drug_era_start_date) - p.year_of_birth) / 10) "
            "AS INTEGER) AS decade FROM drug_era d "
            "JOIN person p USING (person_id) "
            "WHERE d.drug_era_start_date IS NOT NULL)",
            ["drug_concept_id", "decade"],
        ),
        _frag_count(
            908, "drug_era d", where=_outside_op("d", "drug_era_start_date")
        ),
        _frag_count(
            909, "drug_era", where="drug_era_end_date < drug_era_start_date"
        ),
        _frag_count(920, "drug_era", ["strftime(drug_era_start_date, '%Y%m')"]),
        _frag_count(
            1000,
            "(SELECT DISTINCT person_id, condition_concept_id FROM cond_era)",
            ["condition_concept_id"],
        ),
        _frag_count(1001, "cond_era", ["condition_concept_id"]),
        _frag_count(
            1002,
            "(SELECT DISTINCT d.person_id, d.condition_concept_id, "
            "p.gender_concept_id FROM cond_era d JOIN person p USING (person_id))",
            ["condition_concept_id", "gender_concept_id"],
        ),
        _frag_count(
            1004,
            "(SELECT DISTINCT d.person_id, d.condition_concept_id, "
            "CAST(floor((year(d.condition_era_start_date) - p.year_of_birth) "
            "/ 10) AS INTEGER) AS decade FROM cond_era d "
            "JOIN person p USING (person_id) "
            "WHERE d.condition_era_start_date IS NOT NULL)",
            ["condition_concept_id", "decade"],
        ),
        _frag_count(
            1008, "cond_era d",
            where=_outside_op("d", "condition_era_start_date"),
        ),
        _frag_count(
            1009, "cond_era",
            where="condition_era_end_date < condition_era_start_date",
        ),
        _frag_count(
            1020, "cond_era", ["strftime(condition_era_start_date, '%Y%m')"]
        ),
    ),
)
def achilles_era_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drug-era + condition-era counts families (900-920, 1000-1020)
    incl. the new reversed-era slots 909/1009."""
    return _run_clin_counts(
        spark, sf_dir,
        [900, 901, 902, 904, 908, 909, 920,
         1000, 1001, 1002, 1004, 1008, 1009, 1020],
    )


@register(
    "achilles_era_dists",
    oracle=_clin_oracle(
        _frag_dist(
            903,
            "(SELECT CAST(COUNT(*) AS BIGINT) AS v FROM drug_era GROUP BY person_id)",
        ),
        _frag_dist(
            906,
            "(SELECT d.drug_concept_id, year(d.drug_era_start_date) "
            "- p.year_of_birth AS v FROM drug_era d "
            "JOIN person p USING (person_id) "
            "WHERE d.drug_era_start_date IS NOT NULL)",
            ["drug_concept_id"],
        ),
        _frag_dist(
            907,
            "(SELECT drug_era_end_date - drug_era_start_date AS v FROM drug_era)",
        ),
        _frag_dist(
            910,
            "(SELECT drug_concept_id, drug_era_end_date - drug_era_start_date "
            "AS v FROM drug_era)",
            ["drug_concept_id"],
        ),
        _frag_dist(
            911,
            "(SELECT drug_concept_id, gap_days AS v FROM drug_era "
            "WHERE gap_days IS NOT NULL)",
            ["drug_concept_id"],
        ),
        _frag_dist(
            1003,
            "(SELECT CAST(COUNT(*) AS BIGINT) AS v FROM cond_era GROUP BY person_id)",
        ),
        _frag_dist(
            1006,
            "(SELECT d.condition_concept_id, year(d.condition_era_start_date) "
            "- p.year_of_birth AS v FROM cond_era d "
            "JOIN person p USING (person_id) "
            "WHERE d.condition_era_start_date IS NOT NULL)",
            ["condition_concept_id"],
        ),
        _frag_dist(
            1007,
            "(SELECT condition_era_end_date - condition_era_start_date AS v "
            "FROM cond_era)",
        ),
        _frag_dist(
            1010,
            "(SELECT condition_concept_id, condition_era_end_date "
            "- condition_era_start_date AS v FROM cond_era)",
            ["condition_concept_id"],
        ),
    ),
)
def achilles_era_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Era per-person/age/length/gap distributions (903-911, 1003-1010)."""
    return _run_clin_dists(
        spark, sf_dir, [903, 906, 907, 910, 911, 1003, 1006, 1007, 1010]
    )


# --- specimen + note families (2000-2020, 2200-2220) ------------------
@register(
    "achilles_specimen_note",
    oracle=_clin_oracle(
        *_domain_count_frags(
            2000, "specimen_t", "specimen_concept_id", "specimen_date",
            "specimen_type_concept_id", 2020,
        ),
        _frag_count(2010, "specimen_t", ["unit_concept_id"]),
        _frag_count(2012, "specimen_t", ["disease_status_concept_id"]),
        _frag_count(2013, "specimen_t", ["anatomic_site_concept_id"]),
        *_domain_count_frags(
            2200, "note_t", "note_class_concept_id", "note_date",
            "note_type_concept_id", 2220,
        ),
        _frag_count(2209, "note_t", ["encoding_concept_id"]),
        _frag_count(2210, "note_t", ["language_concept_id"]),
        _frag_count(2211, "note_t", where=_BAD_PROVIDER),
        _frag_count(2212, "note_t", where=_BAD_VISIT),
    ),
)
def achilles_specimen_note(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Specimen (2000-2020) + note (2200-2220) counts families."""
    return _run_clin_counts(
        spark, sf_dir,
        [2000, 2001, 2002, 2004, 2005, 2007, 2008, 2010, 2012, 2013, 2020,
         2200, 2201, 2202, 2204, 2205, 2207, 2208, 2209, 2210, 2211, 2212,
         2220],
    )


# --- device_exposure family (2100-2120) -------------------------------
@register(
    "achilles_device_catalog",
    oracle=_clin_oracle(
        *_domain_count_frags(
            2100, "device_t", "device_concept_id",
            "device_exposure_start_date", "device_type_concept_id", 2120,
        ),
        _frag_count(
            2109, "device_t",
            where="device_exposure_end_date < device_exposure_start_date",
        ),
        _frag_count(2111, "device_t", where=_BAD_PROVIDER),
        _frag_count(2112, "device_t", where=_BAD_VISIT),
    ),
)
def achilles_device_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Device exposure counts family (2100-2120)."""
    return _run_clin_counts(
        spark, sf_dir,
        [2100, 2101, 2102, 2104, 2105, 2107, 2108, 2109, 2111, 2112, 2120],
    )


# --- death / specimen / device / note distributions -------------------
@register(
    "achilles_clinical_dists",
    oracle=_clin_oracle(
        _frag_dist(
            503,
            "(SELECT year(d.death_date) - p.year_of_birth AS v "
            "FROM death_t d JOIN person p USING (person_id) "
            "WHERE d.death_date IS NOT NULL)",
        ),
        _frag_dist(
            506,
            "(SELECT p.gender_concept_id, year(d.death_date) "
            "- p.year_of_birth AS v FROM death_t d "
            "JOIN person p USING (person_id) WHERE d.death_date IS NOT NULL)",
            ["gender_concept_id"],
        ),
        _frag_dist(
            2003,
            "(SELECT CAST(COUNT(*) AS BIGINT) AS v FROM specimen_t GROUP BY person_id)",
        ),
        _frag_dist(
            2006,
            "(SELECT d.specimen_concept_id, year(d.specimen_date) "
            "- p.year_of_birth AS v FROM specimen_t d "
            "JOIN person p USING (person_id) WHERE d.specimen_date IS NOT NULL)",
            ["specimen_concept_id"],
        ),
        _frag_dist(
            2009,
            "(SELECT quantity AS v FROM specimen_t WHERE quantity IS NOT NULL)",
        ),
        _frag_dist(
            2103,
            "(SELECT CAST(COUNT(*) AS BIGINT) AS v FROM device_t GROUP BY person_id)",
        ),
        _frag_dist(
            2106,
            "(SELECT d.device_concept_id, year(d.device_exposure_start_date) "
            "- p.year_of_birth AS v FROM device_t d "
            "JOIN person p USING (person_id) "
            "WHERE d.device_exposure_start_date IS NOT NULL)",
            ["device_concept_id"],
        ),
        _frag_dist(
            2115,
            "(SELECT device_concept_id, quantity AS v FROM device_t "
            "WHERE quantity IS NOT NULL)",
            ["device_concept_id"],
        ),
        _frag_dist(
            2203,
            "(SELECT CAST(COUNT(*) AS BIGINT) AS v FROM note_t GROUP BY person_id)",
        ),
        _frag_dist(
            2206,
            "(SELECT d.note_class_concept_id, year(d.note_date) "
            "- p.year_of_birth AS v FROM note_t d "
            "JOIN person p USING (person_id) WHERE d.note_date IS NOT NULL)",
            ["note_class_concept_id"],
        ),
    ),
)
def achilles_clinical_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Death-age + specimen/device/note distributions
    (503/506, 2003/2006/2009, 2103/2106/2115, 2203/2206)."""
    return _run_clin_dists(
        spark, sf_dir,
        [503, 506, 2003, 2006, 2009, 2103, 2106, 2115, 2203, 2206],
    )


# --- round-4 tail slots over the enriched tables ----------------------
@register(
    "achilles_tail_slots",
    oracle=_clin_oracle(
        _frag_count(
            117,
            "(SELECT DISTINCT person_id, strftime(m, '%Y%m') AS ym FROM "
            "(SELECT person_id, UNNEST(generate_series("
            "date_trunc('month', op_start), date_trunc('month', op_end), "
            "INTERVAL 1 MONTH)) AS m FROM op WHERE op_end >= op_start))",
            ["ym"],
        ),
        _frag_count(119, "op_clin", ["period_type_concept_id"]),
        _frag_count(210, "visit_clin", where=_BAD_PROVIDER),
        _frag_count(214, "visit_clin", ["discharged_to_concept_id"]),
        _frag_count(410, "cond_clin", ["condition_status_concept_id"]),
        _frag_count(412, "cond_clin", where=_BAD_VISIT),
        _frag_count(
            1104,
            "(SELECT l.county FROM person_ext p JOIN loc_clin l USING (location_id))",
            ["county"],
        ),
        _frag_count(
            1105,
            "(SELECT l.county FROM care_site cs JOIN loc_clin l USING (location_id))",
            ["county"],
        ),
        _frag_count(1310, "vd_clin", ["discharged_to_concept_id"]),
        _frag_count(1405, "payer_clin", ["plan_concept_id"]),
        _frag_count(1414, "payer_clin", where="pend < pstart"),
        _frag_count(1416, "payer_clin", ["stop_reason_concept_id"]),
        _frag_count(
            1703, "cohort_clin",
            where="cohort_end_date < cohort_start_date",
        ),
        _frag_count(1810, "measurement", where="value_as_number IS NULL"),
        _frag_count(
            1817, "measurement", ["measurement_concept_id", "unit_concept_id"]
        ),
        _frag_count(2409, "episode_clin", where="ep_end < ep_start"),
    ),
)
def achilles_tail_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 within-family tail: observed-months 117, period types
    119, visit provider/discharge 210/214, condition status/visit-FK
    410/412, county geo 1104/1105, visit-detail discharge 1310, payer
    plan/reversed/stop-reason 1405/1414/1416, cohort reversed 1703,
    measurement no-value / concept-unit 1810/1817, episode reversed
    2409 — all counts-shape."""
    return _run_clin_counts(
        spark, sf_dir,
        [117, 119, 210, 214, 410, 412, 1104, 1105, 1310, 1405, 1414, 1416,
         1703, 1810, 1817, 2409],
    )


@register(
    "achilles_tail_dists",
    oracle=_clin_oracle(
        _frag_dist(
            118,
            "(SELECT CAST(SUM(op_end - op_start + 1) AS BIGINT) AS v FROM op "
            "WHERE op_end >= op_start GROUP BY person_id)",
        ),
        _frag_dist(
            415,
            "(SELECT condition_end_date - condition_start_date AS v "
            "FROM cond_clin)",
        ),
        _frag_dist(
            1516,
            "(SELECT paid_patient_copay AS v FROM cost_clin "
            "WHERE paid_patient_copay IS NOT NULL)",
        ),
        _frag_dist(
            1517,
            "(SELECT paid_patient_coinsurance AS v FROM cost_clin "
            "WHERE paid_patient_coinsurance IS NOT NULL)",
        ),
        _frag_dist(
            1518,
            "(SELECT paid_patient_deductible AS v FROM cost_clin "
            "WHERE paid_patient_deductible IS NOT NULL)",
        ),
        _frag_dist(
            1519,
            "(SELECT paid_ingredient_cost AS v FROM cost_clin "
            "WHERE paid_ingredient_cost IS NOT NULL)",
        ),
        _frag_dist(
            1704,
            "(SELECT CAST(COUNT(*) AS BIGINT) AS v FROM cohort_clin "
            "GROUP BY subject_id)",
        ),
        _frag_dist(
            1813,
            "(SELECT measurement_concept_id, unit_concept_id, range_low AS v "
            "FROM measurement WHERE range_low IS NOT NULL)",
            ["measurement_concept_id", "unit_concept_id"],
        ),
        _frag_dist(
            1814,
            "(SELECT measurement_concept_id, unit_concept_id, range_high AS v "
            "FROM measurement WHERE range_high IS NOT NULL)",
            ["measurement_concept_id", "unit_concept_id"],
        ),
    ),
)
def achilles_tail_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 tail distributions: observed-days 118, condition duration
    415, cost paid-amount columns 1516-1519, cohort records-per-subject
    1704, measurement range bounds 1813/1814."""
    return _run_clin_dists(
        spark, sf_dir,
        [118, 415, 1516, 1517, 1518, 1519, 1704, 1813, 1814],
    )


# --- the ETL spine under the hard oracle signal (round 4) -------------
# VERDICT r3 "what's wrong" §3: pipeline/etl.py changed twice in r3 on
# pytest-only coverage.  This query runs the REAL two-stage pipeline
# (prequel keys → usagi mapping → PK swap → FK remap → windowed dedup →
# atomic write) over a deterministic person←customer / visit←orders
# fixture and returns the final omop rows; the DuckDB oracle re-derives
# them — swap ids are reproducible because swap_merge assigns
# row_number() over the identity ordering from offset 0 on a first run
# (operators/sequence.py assign_ids; reference
# bq:etl/{primary_key_column}_swap_merge.sql.jinja:50-77).
@register(
    "etl_mini_cdm",
    oracle="""
    WITH upload AS (
      SELECT 'PK_' || CAST(c_custkey AS VARCHAR) AS x,
             c_mktsegment AS seg, c_name AS name
      FROM customer),
    seg_map(seg, concept) AS (
      VALUES ('AUTOMOBILE', 9001), ('BUILDING', 9002),
             ('FURNITURE', 9003), ('HOUSEHOLD', 9004)),
    mapped AS (
      SELECT u.x, u.name, COALESCE(m.concept, 0) AS segment_concept_id
      FROM upload u LEFT JOIN seg_map m USING (seg)),
    pswap AS (
      SELECT x, segment_concept_id,
             ROW_NUMBER() OVER (ORDER BY x, segment_concept_id) AS y
      FROM (SELECT DISTINCT x, segment_concept_id FROM mapped)),
    person AS (
      SELECT p.y AS person_id, m.segment_concept_id, m.name
      FROM mapped m JOIN pswap p
        ON m.x = p.x AND m.segment_concept_id = p.segment_concept_id),
    vupload AS (
      SELECT 'PK_' || CAST(o_orderkey AS VARCHAR) AS x,
             'PK_' || CAST(o_custkey AS VARCHAR) AS px,
             o_totalprice AS amount
      FROM orders),
    vswap AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS y
      FROM (SELECT DISTINCT x FROM vupload)),
    visit AS (
      SELECT v.y AS visit_id, COALESCE(ps.y, 0) AS person_id, u.amount
      FROM vupload u JOIN vswap v USING (x)
      LEFT JOIN pswap ps ON u.px = ps.x)
    SELECT 'person' AS omop_table, CAST(person_id AS BIGINT) AS pk,
           CAST(-1 AS BIGINT) AS fk,
           CAST(segment_concept_id AS BIGINT) AS concept,
           name AS attr, CAST(-1.0 AS DOUBLE) AS amount
    FROM person
    UNION ALL
    SELECT 'visit', CAST(visit_id AS BIGINT), CAST(person_id AS BIGINT),
           CAST(-1 AS BIGINT), '', amount
    FROM visit
    """,
)
def etl_mini_cdm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ETL spine over customer/orders (pipeline/etl.py run
    loop), returning the final omop person+visit rows in one frame.

    The warehouse is a throwaway temp dir (left for the OS to reap: the
    returned frame reads from it lazily, so it cannot be deleted here).
    MACHINERY is deliberately unmapped → concept 0 (the reference's
    unmapped-code path, J2).  Not-applicable cells carry typed
    sentinels (-1 / '') instead of NULL: the driver's oracle compare
    round-trips through pandas, which coerces NULL-bearing int columns
    to float64 and NULL doubles to NaN — sentinels keep both engines'
    values bit-comparable."""
    import tempfile

    from ..core.registry import ColumnSpec, SchemaRegistry, TableSpec
    from ..pipeline.etl import EtlPipeline, TableInputs
    from ..pipeline.warehouse import Warehouse

    registry = SchemaRegistry(
        [
            TableSpec(
                name="person",
                columns=[
                    ColumnSpec("person_id", "int64", required=True),
                    ColumnSpec("segment_concept_id", "int64", required=True),
                    ColumnSpec("name", "string"),
                ],
                pk="person_id",
                concept_cols=["segment_concept_id"],
            ),
            TableSpec(
                name="visit",
                columns=[
                    ColumnSpec("visit_id", "int64", required=True),
                    ColumnSpec("person_id", "int64", required=True),
                    ColumnSpec("amount", "float64"),
                ],
                pk="visit_id",
                fks={"person_id": "person"},
            ),
        ]
    )
    t = load_tables(spark, sf_dir, "customer", "orders")
    c, o = t["customer"], t["orders"]
    person_upload = c.select(
        F.concat(F.lit("PK_"), F.col("c_custkey").cast("string")).alias(
            "person_id"
        ),
        F.col("c_mktsegment").alias("segment_concept_id__source"),
        F.col("c_name").alias("name"),
    )
    visit_upload = o.select(
        F.concat(F.lit("PK_"), F.col("o_orderkey").cast("string")).alias(
            "visit_id"
        ),
        F.concat(F.lit("PK_"), F.col("o_custkey").cast("string")).alias(
            "person_id"
        ),
        F.col("o_totalprice").alias("amount"),
    )
    usagi = spark.createDataFrame(
        [
            ("AUTOMOBILE", "automobile", "APPROVED", 9001, "AUTO", "Segment"),
            ("BUILDING", "building", "APPROVED", 9002, "BUILD", "Segment"),
            ("FURNITURE", "furniture", "APPROVED", 9003, "FURN", "Segment"),
            ("HOUSEHOLD", "household", "APPROVED", 9004, "HOUSE", "Segment"),
        ],
        "sourceCode string, sourceName string, mappingStatus string, "
        "conceptId long, conceptName string, domainId string",
    )
    whdir = tempfile.mkdtemp(prefix="etl_mini_cdm_")
    wh = Warehouse(whdir)
    pipe = EtlPipeline(spark, wh, registry)
    pipe.run(
        {
            "person": TableInputs(
                uploads=[person_upload],
                usagi={"segment_concept_id": usagi},
            ),
            "visit": TableInputs(uploads=[visit_upload]),
        }
    )
    person = wh.read(spark, "omop", "person").select(
        F.lit("person").alias("omop_table"),
        F.col("person_id").cast("long").alias("pk"),
        F.lit(-1).cast("long").alias("fk"),
        F.col("segment_concept_id").cast("long").alias("concept"),
        F.col("name").alias("attr"),
        F.lit(-1.0).cast("double").alias("amount"),
    )
    visit = wh.read(spark, "omop", "visit").select(
        F.lit("visit").alias("omop_table"),
        F.col("visit_id").cast("long").alias("pk"),
        F.col("person_id").cast("long").alias("fk"),
        F.lit(-1).cast("long").alias("concept"),
        F.lit("").alias("attr"),
        F.col("amount").cast("double").alias("amount"),
    )
    return person.unionByName(visit)


# --- round-5 catalog closure: 102 + death quality/time-to-death -------
@register(
    "achilles_death_quality",
    oracle=_clin_oracle(
        _frag_count(
            102,
            "(SELECT p.gender_concept_id, year(op_start) - year_of_birth "
            "AS age FROM op JOIN person p USING (person_id))",
            ["gender_concept_id", "age"],
        ),
        _frag_count(509, "death_t", where=_NOT_IN_PERSON),
    ),
)
def achilles_death_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 sliver closure, counts shape: public 102 (persons by
    gender × age at first observation period — the counts complement of
    dist 103/104) and 509 (death records with an invalid person_id;
    the fixture seeds them via the c_custkey%57 offset)."""
    return _run_clin_counts(spark, sf_dir, [102, 509])


def _frag_death_dist(aid: int, cte: str, date_col: str) -> str:
    return _frag_dist(
        aid,
        f"(SELECT d.death_date - m.mx AS v FROM death_t d JOIN "
        f"(SELECT person_id, MAX({date_col}) AS mx FROM {cte} "
        f"WHERE {date_col} IS NOT NULL GROUP BY person_id) m "
        f"USING (person_id))",
    )


@register(
    "achilles_death_time_dists",
    oracle=_clin_oracle(
        _frag_death_dist(511, "cond_clin", "condition_start_date"),
        _frag_death_dist(512, "drug", "drug_exposure_start_date"),
        _frag_death_dist(513, "visit_clin", "visit_start_date"),
        _frag_death_dist(514, "proc", "procedure_date"),
        _frag_death_dist(515, "obs_t", "observation_date"),
    ),
)
def achilles_death_time_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Public 511-515: distribution of days from the person's last
    condition / drug / visit / procedure / observation event to death.
    Each is one map-side-combined MAX per person on the event table
    joined to the small death table — no window, one shuffle each."""
    return _run_clin_dists(spark, sf_dir, [511, 512, 513, 514, 515])


# --- round-5 flag parity under the oracle -----------------------------
# The reference's --skip-usagi-and-custom-concept-upload and
# --skip-event-fks-step flags (cli.py:561-580) landed with pytest
# coverage; this query puts BOTH under the hash oracle: run the mini
# pipeline normally, then re-run with skip flags on and the usagi input
# STRIPPED.  If the skip-upload path failed to reuse the persisted work
# usagi tables, every concept would zero AND every person id would move
# (the swap identity includes the concept column) — hash mismatch.  If
# the skip-event path failed, note event columns would carry resolved
# ids instead of NULL — hash mismatch.
@register(
    "etl_skip_flags",
    oracle="""
    WITH upload AS (
      SELECT 'PK_' || CAST(c_custkey AS VARCHAR) AS x,
             c_mktsegment AS seg, c_name AS name
      FROM customer),
    seg_map(seg, concept) AS (
      VALUES ('AUTOMOBILE', 9001), ('BUILDING', 9002),
             ('FURNITURE', 9003), ('HOUSEHOLD', 9004)),
    mapped AS (
      SELECT u.x, u.name, COALESCE(m.concept, 0) AS segment_concept_id
      FROM upload u LEFT JOIN seg_map m USING (seg)),
    pswap AS (
      SELECT x, segment_concept_id,
             ROW_NUMBER() OVER (ORDER BY x, segment_concept_id) AS y
      FROM (SELECT DISTINCT x, segment_concept_id FROM mapped)),
    person AS (
      SELECT p.y AS person_id, m.segment_concept_id, m.name
      FROM mapped m JOIN pswap p
        ON m.x = p.x AND m.segment_concept_id = p.segment_concept_id),
    nupload AS (
      SELECT 'PK_' || CAST(o_orderkey AS VARCHAR) AS x,
             'PK_' || CAST(o_custkey AS VARCHAR) AS px
      FROM orders),
    nswap AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS y
      FROM (SELECT DISTINCT x FROM nupload)),
    note AS (
      SELECT n.y AS note_id, COALESCE(ps.y, 0) AS person_id
      FROM nupload u JOIN nswap n USING (x)
      LEFT JOIN pswap ps ON u.px = ps.x)
    SELECT 'person' AS omop_table, CAST(person_id AS BIGINT) AS pk,
           CAST(-1 AS BIGINT) AS fk,
           CAST(segment_concept_id AS BIGINT) AS concept,
           name AS attr, CAST(-1 AS BIGINT) AS event_id,
           CAST(-1 AS BIGINT) AS event_disc
    FROM person
    UNION ALL
    SELECT 'note', CAST(note_id AS BIGINT), CAST(person_id AS BIGINT),
           CAST(-1 AS BIGINT), '', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
    FROM note
    """,
)
def etl_skip_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two pipeline runs over customer/orders: a normal run persists the
    usagi work tables and assigns swap ids; a second run with
    ``skip_usagi_and_custom_concept_upload=True`` (usagi inputs REMOVED)
    and ``skip_event_fks_step=True`` must reproduce identical person
    rows from the persisted mappings while promoting note with NULL
    event columns (returned as -1 sentinels — see etl_mini_cdm's
    pandas-coercion note)."""
    import tempfile

    from ..core.registry import ColumnSpec, SchemaRegistry, TableSpec
    from ..pipeline.etl import EtlPipeline, TableInputs
    from ..pipeline.warehouse import Warehouse

    registry = SchemaRegistry(
        [
            TableSpec(
                name="person",
                columns=[
                    ColumnSpec("person_id", "int64", required=True),
                    ColumnSpec("segment_concept_id", "int64", required=True),
                    ColumnSpec("name", "string"),
                ],
                pk="person_id",
                concept_cols=["segment_concept_id"],
            ),
            TableSpec(
                name="note",
                columns=[
                    ColumnSpec("note_id", "int64", required=True),
                    ColumnSpec("person_id", "int64", required=True),
                ],
                pk="note_id",
                fks={"person_id": "person"},
                event_cols={"note_event_id": "note_event_field_concept_id"},
            ),
        ]
    )
    t = load_tables(spark, sf_dir, "customer", "orders")
    c, o = t["customer"], t["orders"]
    person_upload = c.select(
        F.concat(F.lit("PK_"), F.col("c_custkey").cast("string")).alias(
            "person_id"
        ),
        F.col("c_mktsegment").alias("segment_concept_id__source"),
        F.col("c_name").alias("name"),
    )
    note_upload = o.select(
        F.concat(F.lit("PK_"), F.col("o_orderkey").cast("string")).alias(
            "note_id"
        ),
        F.concat(F.lit("PK_"), F.col("o_custkey").cast("string")).alias(
            "person_id"
        ),
        F.concat(F.lit("PK_"), F.col("o_custkey").cast("string")).alias(
            "note_event_id"
        ),
        F.lit("person").alias("note_event_field_concept_id"),
    )
    usagi = spark.createDataFrame(
        [
            ("AUTOMOBILE", "automobile", "APPROVED", 9001, "AUTO", "Segment"),
            ("BUILDING", "building", "APPROVED", 9002, "BUILD", "Segment"),
            ("FURNITURE", "furniture", "APPROVED", 9003, "FURN", "Segment"),
            ("HOUSEHOLD", "household", "APPROVED", 9004, "HOUSE", "Segment"),
        ],
        "sourceCode string, sourceName string, mappingStatus string, "
        "conceptId long, conceptName string, domainId string",
    )
    whdir = tempfile.mkdtemp(prefix="etl_skip_flags_")
    wh = Warehouse(whdir)
    EtlPipeline(spark, wh, registry).run(
        {
            "person": TableInputs(
                uploads=[person_upload],
                usagi={"segment_concept_id": usagi},
            ),
            "note": TableInputs(uploads=[note_upload]),
        }
    )
    # second run: no usagi inputs at all — the skip path must find them
    # in the work zone; skip-event promotes note with NULL event cols
    EtlPipeline(
        spark,
        wh,
        registry,
        skip_usagi_and_custom_concept_upload=True,
        skip_event_fks_step=True,
    ).run(
        {
            "person": TableInputs(uploads=[person_upload]),
            "note": TableInputs(uploads=[note_upload]),
        }
    )
    person = wh.read(spark, "omop", "person").select(
        F.lit("person").alias("omop_table"),
        F.col("person_id").cast("long").alias("pk"),
        F.lit(-1).cast("long").alias("fk"),
        F.col("segment_concept_id").cast("long").alias("concept"),
        F.col("name").alias("attr"),
        F.lit(-1).cast("long").alias("event_id"),
        F.lit(-1).cast("long").alias("event_disc"),
    )
    note = wh.read(spark, "omop", "note").select(
        F.lit("note").alias("omop_table"),
        F.col("note_id").cast("long").alias("pk"),
        F.col("person_id").cast("long").alias("fk"),
        F.lit(-1).cast("long").alias("concept"),
        F.lit("").alias("attr"),
        F.coalesce(F.col("note_event_id").cast("long"), F.lit(-1)).alias(
            "event_id"
        ),
        F.coalesce(
            F.col("note_event_field_concept_id").cast("long"), F.lit(-1)
        ).alias("event_disc"),
    )
    return person.unionByName(note)
