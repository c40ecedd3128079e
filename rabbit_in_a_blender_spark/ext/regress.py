"""Closed-form distributed model fitting over document features.

A training-data pipeline constantly needs cheap fitted baselines —
"does this doc's length match its token count?", "which docs are
statistical outliers for their language?" — without an ML-runtime
dependency.  Simple linear regression has an exact closed form that is
pure aggregation, so the *fit* is one shuffle over 100 TB:

    slope     = covar_pop(y, x) / var_pop(x)
    intercept = avg(y) - slope * avg(x)
    r2        = corr(y, x)^2

- ``grouped_linreg``: one model per group (e.g. per language) from a
  single groupBy.agg pass — everything stays in whole-stage codegen.
- ``residual_outliers``: scores every document against its group's
  model and keeps the top-k by |residual| per group.  The model table
  is |groups| rows, so the score join is a broadcast — the classic
  "fit with one aggregate, apply with zero extra shuffles" shape.

Reference parity note: the reference (RiaB) has no statistics surface;
extension scope (SURVEY §2.N), oracle-twinned via the same covar/var
formulas in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _xy(df: DataFrame, group_col: str, x_col: str, y_col: str) -> DataFrame:
    return df.select(
        F.col(group_col).alias("__g"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )


def grouped_linreg(df: DataFrame, group_col: str, x_col: str, y_col: str) -> DataFrame:
    """Per-group OLS fit of y on x; returns group, n, slope, intercept, r2.

    Groups with zero x-variance (slope undefined) are dropped.
    """
    agg = (
        _xy(df, group_col, x_col, y_col)
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.covar_pop("__y", "__x").alias("__cov"),
            F.var_pop("__x").alias("__varx"),
            F.avg("__x").alias("__mx"),
            F.avg("__y").alias("__my"),
            F.var_pop("__y").alias("__vary"),
        )
        .where(F.col("__varx") > 0)
    )
    slope = F.col("__cov") / F.col("__varx")
    # r2 = cov^2 / (varx * vary); try_divide → NULL when y is constant
    # (F.corr would divide by zero DURING aggregation under ANSI mode,
    # before any post-agg filter can guard it)
    r2 = F.try_divide(F.col("__cov") * F.col("__cov"), F.col("__varx") * F.col("__vary"))
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.round(slope, 4).alias("slope"),
        F.round(F.col("__my") - slope * F.col("__mx"), 4).alias("intercept"),
        F.round(r2, 4).alias("r2"),
    )


def residual_outliers(
    df: DataFrame,
    group_col: str,
    id_col: str,
    x_col: str,
    y_col: str,
    k: int = 5,
) -> DataFrame:
    """Top-k docs per group by |residual| against the group's OLS fit.

    The per-group model (unrounded, full precision) is broadcast back
    onto the rows; ranking uses the *rounded* |residual| with the id as
    tie-break so any engine reproduces the cut identically.
    """
    xy = df.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )
    model = (
        xy.groupBy("__g")
        .agg(
            F.covar_pop("__y", "__x").alias("__cov"),
            F.var_pop("__x").alias("__varx"),
            F.avg("__x").alias("__mx"),
            F.avg("__y").alias("__my"),
        )
        .where(F.col("__varx") > 0)
        .select(
            "__g",
            (F.col("__cov") / F.col("__varx")).alias("__slope"),
            (F.col("__my") - (F.col("__cov") / F.col("__varx")) * F.col("__mx")).alias(
                "__icept"
            ),
        )
    )
    scored = xy.join(F.broadcast(model), "__g").withColumn(
        "resid", F.round(F.col("__y") - (F.col("__icept") + F.col("__slope") * F.col("__x")), 4)
    )
    w = Window.partitionBy("__g").orderBy(F.abs(F.col("resid")).desc(), F.col("__id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            F.col("__g").alias(group_col),
            F.col("__id").alias(id_col),
            F.col("__x").cast("long").alias("x_value"),
            F.col("__y").cast("long").alias("y_value"),
            "resid",
            F.col("__rn").cast("long").alias("rank_in_group"),
        )
    )
