"""Data-Quality-Dashboard-style check builders (SURVEY §2.K).

The reference runs ~hundreds of OHDSI DQD checks, each producing one row
``{num_violated_rows, pct_violated_rows, num_denominator_rows}``
(/root/reference/src/riab/etl/data_quality.py:390-393), evaluated against
a threshold (:322-347).  Here every check family is a parameterized
builder returning that exact one-row shape as a DataFrame — no SQL
translation layer (SqlRender) needed, since check logic is expressed
directly against Catalyst.

Scale: every check is a filter + count — predicate pushdown reaches the
parquet scan, and counts are map-side partial aggregations.  Checks are
independent jobs; submit them concurrently (FAIR scheduler) like the
reference's thread-pool fan-out (data_quality.py:227-237).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_result(df: DataFrame, violated: Column, check_name: str) -> DataFrame:
    """Standard DQD result row: violated / pct / denominator."""
    return df.agg(
        F.lit(check_name).alias("check_name"),
        F.sum(F.when(violated, 1).otherwise(0)).cast("long").alias("num_violated_rows"),
        F.round(
            F.sum(F.when(violated, 1).otherwise(0))
            / F.greatest(F.count(F.lit(1)), F.lit(1)),
            6,
        ).alias("pct_violated_rows"),
        F.count(F.lit(1)).cast("long").alias("num_denominator_rows"),
    )


def is_required(df: DataFrame, col: str, check_name: str | None = None) -> DataFrame:
    """DQD isRequired: NULL in a required column."""
    return check_result(df, F.col(col).isNull(), check_name or f"isRequired_{col}")


def plausible_value_low(
    df: DataFrame, col: str, low, check_name: str | None = None
) -> DataFrame:
    """DQD plausibleValueLow: non-null value below the plausible floor."""
    return check_result(
        df,
        F.col(col).isNotNull() & (F.col(col) < F.lit(low)),
        check_name or f"plausibleValueLow_{col}",
    )


def fk_orphans(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
    check_name: str | None = None,
) -> DataFrame:
    """DQD isForeignKey: child keys with no parent row.

    Left join against the (small, broadcast) parent key set; at scale the
    parent side of an FK check is the dimension, so broadcast is right.
    """
    parent_keys = parent.select(F.col(pk).alias("__pk")).distinct()
    joined = child.join(
        F.broadcast(parent_keys), child[fk] == F.col("__pk"), "left"
    )
    return check_result(
        joined,
        F.col(fk).isNotNull() & F.col("__pk").isNull(),
        check_name or f"isForeignKey_{fk}",
    )


def start_before_end(
    df: DataFrame, start_col: str, end_col: str, check_name: str | None = None
) -> DataFrame:
    """DQD plausibleStartBeforeEnd: end precedes start."""
    return check_result(
        df,
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) < F.col(start_col)),
        check_name or f"plausibleStartBeforeEnd_{start_col}_{end_col}",
    )


def plausible_value_high(
    df: DataFrame, col: str, high, check_name: str | None = None
) -> DataFrame:
    """DQD plausibleValueHigh: non-null value above the plausible ceiling."""
    return check_result(
        df,
        F.col(col).isNotNull() & (F.col(col) > F.lit(high)),
        check_name or f"plausibleValueHigh_{col}",
    )


def concept_completeness(
    df: DataFrame, concept_col: str, check_name: str | None = None
) -> DataFrame:
    """DQD standardConceptRecordCompleteness: unmapped rows (concept 0)."""
    return check_result(
        df,
        F.col(concept_col).isNull() | (F.col(concept_col) == 0),
        check_name or f"standardConceptRecordCompleteness_{concept_col}",
    )


def cdm_datatype(
    df: DataFrame, col: str, dtype: str, check_name: str | None = None
) -> DataFrame:
    """DQD cdmDatatype: non-null values that fail to cast to the CDM type
    (try_cast semantics — no job-killing CAST errors)."""
    return check_result(
        df,
        F.col(col).isNotNull() & F.col(col).try_cast(dtype).isNull(),
        check_name or f"cdmDatatype_{col}_{dtype}",
    )


def fk_domain(
    df: DataFrame,
    concept_col: str,
    concept: DataFrame,
    allowed_domains: list[str],
    check_name: str | None = None,
) -> DataFrame:
    """DQD fkDomain: mapped concept's domain outside the column's allowed
    set (bq:..._usagi_fk_domain_check.sql.jinja:3-18)."""
    lookup = concept.select(
        F.col("concept_id").alias("__cid"), F.col("domain_id").alias("__dom")
    )
    joined = df.join(F.broadcast(lookup), df[concept_col] == F.col("__cid"), "left")
    return check_result(
        joined,
        (F.col(concept_col) > 0)
        & F.col("__dom").isNotNull()
        & ~F.col("__dom").isin(allowed_domains),
        check_name or f"fkDomain_{concept_col}",
    )


def within_visit_dates(
    fact: DataFrame,
    visit: DataFrame,
    fact_fk: str,
    fact_date: str,
    visit_pk: str,
    visit_start: str,
    visit_end: str,
    check_name: str = "withinVisitDates",
) -> DataFrame:
    """DQD withinVisitDates: fact date outside its visit's date range."""
    v = visit.select(
        F.col(visit_pk).alias("__vid"),
        F.col(visit_start).alias("__vs"),
        F.col(visit_end).alias("__ve"),
    )
    joined = fact.join(v, fact[fact_fk] == F.col("__vid"), "left")
    return check_result(
        joined,
        F.col("__vid").isNotNull()
        & F.col(fact_date).isNotNull()
        & ((F.col(fact_date) < F.col("__vs")) | (F.col(fact_date) > F.col("__ve"))),
        check_name,
    )
