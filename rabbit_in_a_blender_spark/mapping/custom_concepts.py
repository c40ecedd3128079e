"""Custom-concept management (SURVEY §3.1 step 4b).

Custom concepts live in the id band ≥ 2 000 000 000 (reference constant
etl/etl_base.py:20-22).  Ids are assigned by
``RANK() OVER (ORDER BY concept_code) + IFNULL(MAX(y), 2_000_000_000)``
against a persistent concept_id swap table
(bq:etl/CONCEPT_ID_swap_merge.sql.jinja:3-17) — RANK, not ROW_NUMBER:
equal codes share an id (SURVEY §7 known-hard #6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.sequence import next_offset

CUSTOM_CONCEPT_OFFSET = 2_000_000_000


def assign_custom_concept_ids(
    swap: DataFrame | None,
    concepts: DataFrame,
    code_col: str = "concept_code",
    key_prefix: str = "",
) -> DataFrame:
    """Extend the concept-id swap (x=code string, y=id) with unseen codes.

    ``key_prefix`` mirrors the reference's column-scoped swap key
    ``concat('{concept_id_column}__', concept_code)``
    (bq:etl/..._usagi_update_custom_concepts.sql.jinja) so the same code
    used by two concept columns gets two ids.

    The global-order RANK window is acceptable here because custom
    concepts are dimension-sized (thousands), never fact-sized.
    """
    new = concepts.select(
        F.concat(F.lit(key_prefix), F.col(code_col)).alias("x")
    ).distinct()
    offset = CUSTOM_CONCEPT_OFFSET
    if swap is not None:
        new = new.join(swap.select("x"), "x", "left_anti")
        offset = max(offset, next_offset(swap, "y", CUSTOM_CONCEPT_OFFSET))
    w = Window.orderBy("x")
    assigned = new.withColumn("y", (F.rank().over(w) + F.lit(offset)).cast("long"))
    return assigned if swap is None else swap.select("x", "y").unionByName(assigned)


def duplicate_concept_codes(concepts: DataFrame, code_col: str = "concept_code") -> DataFrame:
    """Duplicate concept codes — the reference raises on these
    (bq:etl/CONCEPT_custom_validate_duplicates.sql.jinja:3-10)."""
    return (
        concepts.groupBy(code_col)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def validate_custom_concepts(
    concepts: DataFrame,
    domain: DataFrame,
    vocabulary: DataFrame,
    concept_class: DataFrame,
) -> DataFrame:
    """Referential validation (J8): each custom concept's domain_id /
    vocabulary_id / concept_class_id must exist in the vocab tables
    (bq:etl/CONCEPT_custom_validate.sql.jinja:3-10).  Returns violating
    rows (reference LIMITs to 100 for the error message)."""
    d = domain.select(F.col("domain_id").alias("__d")).distinct()
    v = vocabulary.select(F.col("vocabulary_id").alias("__v")).distinct()
    c = concept_class.select(F.col("concept_class_id").alias("__c")).distinct()
    out = (
        concepts.join(F.broadcast(d), concepts["domain_id"] == F.col("__d"), "left")
        .join(F.broadcast(v), concepts["vocabulary_id"] == F.col("__v"), "left")
        .join(F.broadcast(c), concepts["concept_class_id"] == F.col("__c"), "left")
        .filter(F.col("__d").isNull() | F.col("__v").isNull() | F.col("__c").isNull())
        .drop("__d", "__v", "__c")
    )
    return out.limit(100)
