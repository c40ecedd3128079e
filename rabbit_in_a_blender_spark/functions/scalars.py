"""Scalar-function helpers (SURVEY §2.H) used across the engine.

All are thin compositions of built-in ``pyspark.sql.functions`` — they
stay inside whole-stage codegen; none drops to Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PK_PREQUEL = "PK_PREQUAL_"
FK_PREQUEL = "FK_PREQUAL_"
CONCEPT_PREQUEL = "CONCEPT_PREQUAL_"


def prequel_key(col, prefix: str = PK_PREQUEL) -> Column:
    """F1: string "prequel" tagging of source keys
    (bq:cdm_folders/sample_etl_query.sql.jinja:31-36)."""
    return F.concat(F.lit(prefix), F.col(col).cast("string") if isinstance(col, str) else col.cast("string"))


def null_default(col, default) -> Column:
    """F3: IFNULL with a typed default (0 / '' / '?')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


def left_truncate(col, n: int = 255) -> Column:
    """F8: LEFT(s, n) — the SQL Server _source_value truncation
    (ss:etl/{omop_table}_merge.sql.jinja:51)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n)


def format_ts(col, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """F7: FORMAT_TIMESTAMP equivalent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, fmt)


def parse_compact_date(col) -> Column:
    """F11: '%Y%m%d' string → date (vocab CSV dates)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c, "yyyyMMdd")


def mask_digits(col, repl: str = "#") -> Column:
    """F10-style regex replace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[0-9]+", repl)
