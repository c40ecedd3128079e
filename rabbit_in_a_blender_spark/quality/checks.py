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

    Left join against the parent's distinct key set.  Broadcast vs
    shuffle is AQE's runtime call: dimension parents broadcast, but a
    person/visit parent key set is fact-sized at scale and must not be
    force-broadcast.
    """
    parent_keys = parent.select(F.col(pk).alias("__pk")).distinct()
    joined = child.join(
        parent_keys, child[fk] == F.col("__pk"), "left"
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
    joined = df.join(lookup, df[concept_col] == F.col("__cid"), "left")
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


def measure_person_completeness(
    person: DataFrame,
    fact: DataFrame,
    person_pk: str,
    fact_fk: str,
    check_name: str = "measurePersonCompleteness",
) -> DataFrame:
    """DQD measurePersonCompleteness: persons with no record in the fact
    table.  Anti-join keyed on the (already distinct) person pk; the fact
    side reduces to its distinct fk set first so the join shuffles keys,
    not fact rows."""
    fact_keys = fact.select(F.col(fact_fk).alias("__fk")).distinct()
    joined = person.join(
        fact_keys, person[person_pk] == F.col("__fk"), "left"
    )
    return check_result(joined, F.col("__fk").isNull(), check_name)


def cdm_table(
    exists: bool, table: str, check_name: str | None = None
) -> tuple[str, int, float, int]:
    """DQD cdmTable: the table exists in the CDM zone.  Metadata-level —
    returns the standard tuple directly (no DataFrame needed)."""
    violated = 0 if exists else 1
    return (check_name or f"cdmTable_{table}", violated, float(violated), 1)


def cdm_field(
    df: DataFrame, col: str, check_name: str | None = None
) -> tuple[str, int, float, int]:
    """DQD cdmField: the column exists in the table (metadata-level)."""
    violated = 0 if col in df.columns else 1
    return (check_name or f"cdmField_{col}", violated, float(violated), 1)


def is_primary_key(df: DataFrame, pk: str, check_name: str | None = None) -> DataFrame:
    """DQD isPrimaryKey: rows whose pk value occurs more than once.

    Count-per-key via a window on the pk — one shuffle on the key, no
    join back."""
    from pyspark.sql import Window

    cnt = F.count(F.lit(1)).over(Window.partitionBy(pk))
    return check_result(
        df.withColumn("__pk_cnt", cnt),
        F.col("__pk_cnt") > 1,
        check_name or f"isPrimaryKey_{pk}",
    )


def fk_class(
    df: DataFrame,
    concept_col: str,
    concept: DataFrame,
    allowed_classes: list[str],
    check_name: str | None = None,
) -> DataFrame:
    """DQD fkClass: mapped concept's concept_class outside the allowed set
    (sibling of fkDomain)."""
    lookup = concept.select(
        F.col("concept_id").alias("__cid"),
        F.col("concept_class_id").alias("__cls"),
    )
    joined = df.join(lookup, df[concept_col] == F.col("__cid"), "left")
    return check_result(
        joined,
        (F.col(concept_col) > 0)
        & F.col("__cls").isNotNull()
        & ~F.col("__cls").isin(allowed_classes),
        check_name or f"fkClass_{concept_col}",
    )


def measure_value_completeness(
    df: DataFrame, col: str, check_name: str | None = None
) -> DataFrame:
    """DQD measureValueCompleteness: NULL fraction of any column."""
    return check_result(
        df, F.col(col).isNull(), check_name or f"measureValueCompleteness_{col}"
    )


def source_concept_completeness(
    df: DataFrame, source_concept_col: str, check_name: str | None = None
) -> DataFrame:
    """DQD sourceConceptRecordCompleteness: source concept id 0/NULL."""
    return check_result(
        df,
        F.col(source_concept_col).isNull() | (F.col(source_concept_col) == 0),
        check_name or f"sourceConceptRecordCompleteness_{source_concept_col}",
    )


def source_value_completeness(
    df: DataFrame, source_value_col: str, check_name: str | None = None
) -> DataFrame:
    """DQD sourceValueCompleteness: NULL/empty source value strings."""
    return check_result(
        df,
        F.col(source_value_col).isNull() | (F.trim(F.col(source_value_col)) == ""),
        check_name or f"sourceValueCompleteness_{source_value_col}",
    )


def plausible_after_birth(
    fact: DataFrame,
    person: DataFrame,
    fact_fk: str,
    date_col: str,
    person_pk: str,
    birth_col: str,
    check_name: str | None = None,
) -> DataFrame:
    """DQD plausibleAfterBirth: event dated before the person's birth."""
    p = person.select(
        F.col(person_pk).alias("__pid"), F.col(birth_col).alias("__birth")
    )
    joined = fact.join(p, fact[fact_fk] == F.col("__pid"), "left")
    return check_result(
        joined,
        F.col("__birth").isNotNull()
        & F.col(date_col).isNotNull()
        & (F.col(date_col) < F.col("__birth")),
        check_name or f"plausibleAfterBirth_{date_col}",
    )


def plausible_before_death(
    fact: DataFrame,
    death: DataFrame,
    fact_fk: str,
    date_col: str,
    death_pk: str,
    death_date_col: str,
    grace_days: int = 60,
    check_name: str | None = None,
) -> DataFrame:
    """DQD plausibleBeforeDeath: event more than ``grace_days`` after the
    person's death date (DQD uses a 60-day grace window)."""
    d = death.select(
        F.col(death_pk).alias("__pid"), F.col(death_date_col).alias("__dd")
    )
    joined = fact.join(d, fact[fact_fk] == F.col("__pid"), "left")
    return check_result(
        joined,
        F.col("__dd").isNotNull()
        & F.col(date_col).isNotNull()
        & (F.col(date_col) > F.date_add(F.col("__dd"), grace_days)),
        check_name or f"plausibleBeforeDeath_{date_col}",
    )


def plausible_gender(
    fact: DataFrame,
    person: DataFrame,
    fact_fk: str,
    concept_col: str,
    gender_specific: dict[int, int],
    person_pk: str = "person_id",
    gender_col: str = "gender_concept_id",
    check_name: str | None = None,
) -> DataFrame:
    """DQD plausibleGenderUseDescendants (flattened): rows whose concept is
    gender-specific (``gender_specific`` maps concept_id → required gender
    concept) but the person's gender differs.  The descendant expansion is
    precomputed into the dict — at runtime it's one broadcast join."""
    p = person.select(
        F.col(person_pk).alias("__pid"), F.col(gender_col).alias("__g")
    )
    required = F.create_map(
        *[F.lit(x) for kv in gender_specific.items() for x in kv]
    )
    joined = fact.join(p, fact[fact_fk] == F.col("__pid"), "left")
    req = required[F.col(concept_col)]
    return check_result(
        joined,
        req.isNotNull() & F.col("__g").isNotNull() & (F.col("__g") != req),
        check_name or f"plausibleGender_{concept_col}",
    )


def plausible_unit_concept_ids(
    df: DataFrame,
    concept_col: str,
    unit_col: str,
    allowed_units: dict[int, list[int]],
    check_name: str | None = None,
) -> DataFrame:
    """DQD plausibleUnitConceptIds: measurement rows whose unit concept is
    outside the allowed set for that measurement concept."""
    pairs = [
        (mid, uid) for mid, units in allowed_units.items() for uid in units
    ]
    allowed = F.array(
        *[F.struct(F.lit(m).alias("m"), F.lit(u).alias("u")) for m, u in pairs]
    )
    checked = F.array_contains(
        allowed, F.struct(F.col(concept_col).alias("m"), F.col(unit_col).alias("u"))
    )
    in_scope = F.col(concept_col).isin(list(allowed_units.keys()))
    return check_result(
        df,
        in_scope & F.col(unit_col).isNotNull() & ~checked,
        check_name or f"plausibleUnitConceptIds_{concept_col}",
    )
