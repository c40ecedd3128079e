"""Dataset profiling for pipeline QA: per-column cardinality and null
stats with approx_count_distinct (HLL) — bounded memory at any scale.

The exact-count twin (ext_profile_distinct in the catalog) is the
oracle-checkable variant; this one is the 100 TB default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_profile(df: DataFrame, rsd: float = 0.05) -> DataFrame:
    """One row per column: approx distinct count, null count, null ratio."""
    n = F.count(F.lit(1))
    rows = []
    for c in df.columns:
        rows.append(
            df.agg(
                F.lit(c).alias("column_name"),
                F.approx_count_distinct(F.col(c), rsd).cast("long").alias(
                    "approx_distinct"
                ),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_nulls"),
                n.cast("long").alias("n_rows"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.withColumn(
        "null_ratio", F.round(F.col("n_nulls") / F.greatest(F.col("n_rows"), F.lit(1)), 6)
    )
