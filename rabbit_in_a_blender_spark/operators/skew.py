"""Skew-mitigation helpers (SURVEY §7 rule: skewed keys → salting or AQE).

AQE's skew-join splitting handles most cases automatically
(spark.sql.adaptive.skewJoin.enabled is on in core.session); these
helpers cover the two patterns AQE can't fix:

- ``salted_agg``: a groupBy whose hot key overwhelms one reducer even
  with partial aggregation (e.g. high-cardinality payloads per key).
  Two-phase: group on (key, salt) then re-group on key.
- ``salted_broadcast_left``: fact⟕dim join where the DIM side must be
  shuffled (too big to broadcast) and fact keys are skewed — replicate
  each dim row ``salts`` times, salt the fact side randomly-but-
  deterministically (hash of a unique column), join on (key, salt).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    salt_col: str,
    salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for count/sum/min/max.

    ``aggs`` maps column -> agg fn name; ``salt_col`` is any column whose
    hash spreads the hot key (a unique id).  Phase 1 shrinks each hot key
    to ``salts`` rows; phase 2 is trivially balanced.
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    salt = (F.abs(F.hash(F.col(salt_col))) % salts).alias("__salt")
    phase1 = df.groupBy(*[F.col(k) for k in keys], salt).agg(
        *[
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(F.col(c))).alias(
                f"__p_{c}_{fn}"
            )
            for c, fn in aggs.items()
        ]
    )
    return phase1.groupBy(*[F.col(k) for k in keys]).agg(
        *[
            getattr(F, merge_fn[fn])(F.col(f"__p_{c}_{fn}")).alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_col: str,
    salts: int = 8,
) -> DataFrame:
    """Skew-safe left join: replicate dim × salts, salt fact by hash.

    Output columns = fact ∪ dim (minus dim's key copy).
    """
    salt_values = F.explode(
        F.sequence(F.lit(0), F.lit(salts - 1))
    ).alias("__salt")
    dim_rep = dim.select("*", salt_values)
    fact_s = fact.withColumn("__salt", F.abs(F.hash(F.col(salt_col))) % salts)
    dim_key = f"__dim_{key}"
    dim_rep = dim_rep.withColumnRenamed(key, dim_key)
    out = fact_s.join(
        dim_rep,
        (fact_s[key] == dim_rep[dim_key]) & (fact_s["__salt"] == dim_rep["__salt"]),
        "left",
    )
    return out.drop("__salt", dim_key)


def explain_shuffle_count(df: DataFrame) -> int:
    """Count Exchange operators in the physical plan — the shuffle budget
    assertion used by plan-shape tests."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
