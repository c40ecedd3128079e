"""Distribution-drift QC between corpus strata.

When a crawl snapshot, a new source, or a re-filtered corpus lands, the
curation question is "did the distribution move?" — before any model
sees the data.  Two standard closed-form answers, both pure
aggregation (no ML runtime, no sampling):

- ``psi_drift``: Population Stability Index of a numeric column per
  stratum against a reference stratum.  Bin edges come from the
  REFERENCE quantiles (the PSI convention), binning is a broadcast of
  the tiny edge array, and every (stratum, bin) cell is materialized on
  a dense grid so add-half smoothing sees empty bins.  Rule of thumb:
  PSI < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 action.
- ``ks_statistic``: two-sample Kolmogorov-Smirnov statistic
  (max |ECDF_cand - ECDF_ref|) per stratum vs the reference.

Scale notes (the 100 TB shape):

- PSI: one aggregate for the edges (quantile sketch at scale —
  ``percentile`` here for oracle-exactness, ``approx_percentile`` is
  the documented swap), one broadcast, one (stratum, bin) count
  shuffle.  The dense grid is |strata| x |bins| — metadata-sized.
- KS: the reference stratum's rows are replicated per candidate
  stratum (it is the yardstick every stratum is held against), so keep
  the reference a bounded sample at scale; the ECDF window runs per
  stratum over rows grouped by distinct value, i.e. already-shrunk
  data when values are bucketed/discrete (n_chars here).

Reference parity note: the reference engine (RiaB) has no statistics
surface; extension scope (SURVEY §2.N), oracle-twinned in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def psi_drift(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    ref_stratum: str,
    n_bins: int = 4,
) -> DataFrame:
    """PSI of value_col's distribution per stratum vs ``ref_stratum``.

    Returns one row per non-reference stratum: ``stratum, n_docs, psi``
    (psi rounded to 4 decimals; add-half smoothing keeps empty bins
    finite).  Bin edges are the reference's interior quantiles
    (n_bins-1 of them), so bins hold ~equal reference mass.
    """
    probs = F.array(*[F.lit(i / n_bins) for i in range(1, n_bins)])
    v = F.col(value_col).cast("double")
    base = df.select(F.col(stratum_col).alias("__s"), v.alias("__v"))
    edges = base.where(F.col("__s") == ref_stratum).agg(
        F.percentile("__v", probs).alias("__edges")
    )
    binned = (
        base.crossJoin(F.broadcast(edges))
        .withColumn(
            "__bin",
            F.aggregate(
                "__edges",
                F.lit(0),
                lambda acc, e: acc + F.when(F.col("__v") >= e, 1).otherwise(0),
            ),
        )
        .groupBy("__s", "__bin")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    # dense (stratum, bin) grid so empty bins exist for smoothing
    grid = (
        base.select("__s")
        .distinct()
        .crossJoin(
            F.broadcast(
                df.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("__bin"))
            )
        )
    )
    cells = (
        grid.join(binned, ["__s", "__bin"], "left")
        .withColumn("__c", F.coalesce(F.col("__c"), F.lit(0)))
    )
    tot = Window.partitionBy("__s")
    shares = cells.withColumn(
        "__p",
        (F.col("__c") + F.lit(0.5))
        / (F.sum("__c").over(tot) + F.lit(0.5 * n_bins)),
    )
    ref = shares.where(F.col("__s") == ref_stratum).select(
        F.col("__bin"), F.col("__p").alias("__pr")
    )
    return (
        shares.where(F.col("__s") != ref_stratum)
        .join(F.broadcast(ref), "__bin")
        .groupBy("__s")
        .agg(
            F.sum("__c").cast("long").alias("n_docs"),
            F.round(
                F.sum((F.col("__p") - F.col("__pr")) * F.log(F.col("__p") / F.col("__pr"))),
                4,
            ).alias("psi"),
        )
        .select(F.col("__s").alias(stratum_col), "n_docs", "psi")
    )


def fit_reference_profile(
    ref: DataFrame, value_col: str, n_bins: int = 4
) -> tuple[list[float], list[float]]:
    """Fit the fixed reference profile a continuous drift monitor scores
    against: (quantile bin edges, add-half-smoothed bin shares).

    Both results are n_bins-sized driver lists (metadata, not data) —
    the smoothing matches ``psi_drift`` exactly, so a monitor fed this
    profile converges to the same PSI the batch operator computes.
    """
    probs = F.array(*[F.lit(i / n_bins) for i in range(1, n_bins)])
    v = F.col(value_col).cast("double")
    edges = ref.agg(F.percentile(v, probs)).collect()[0][0]
    binned = (
        ref.select(
            F.aggregate(
                F.array(*[F.lit(float(e)) for e in edges]),
                F.lit(0),
                lambda acc, e: acc + F.when(v >= e, 1).otherwise(0),
            ).alias("__bin")
        )
        .groupBy("__bin")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    )
    counts = {r["__bin"]: r["__c"] for r in binned}
    total = sum(counts.values())
    shares = [
        (counts.get(b, 0) + 0.5) / (total + 0.5 * n_bins) for b in range(n_bins)
    ]
    return [float(e) for e in edges], shares


def jsd_drift(
    df: DataFrame,
    stratum_col: str,
    category_col: str,
    ref_stratum: str,
) -> DataFrame:
    """Jensen-Shannon divergence of a CATEGORICAL column per stratum vs
    the reference stratum (the categorical sibling of ``psi_drift``).

    JSD = 0.5*KL(p||m) + 0.5*KL(q||m) with m = (p+q)/2, natural log —
    bounded by ln(2), symmetric, finite on disjoint supports (unlike
    PSI/KL, no smoothing needed: a category absent on one side
    contributes only through the other's ``x*ln(2)`` term).  Categories
    are densified onto the union grid per stratum so zero cells exist.

    Returns ``stratum, n_docs, jsd`` (4 decimals).
    """
    base = df.select(
        F.col(stratum_col).alias("__s"), F.col(category_col).alias("__c")
    )
    counts = base.groupBy("__s", "__c").agg(F.count(F.lit(1)).alias("__n"))
    cats = counts.select("__c").distinct()
    grid = counts.select("__s").distinct().crossJoin(F.broadcast(cats))
    cells = grid.join(counts, ["__s", "__c"], "left").withColumn(
        "__n", F.coalesce(F.col("__n"), F.lit(0))
    )
    tot = Window.partitionBy("__s")
    shares = cells.withColumn("__p", F.col("__n") / F.sum("__n").over(tot))
    ref = shares.where(F.col("__s") == ref_stratum).select(
        F.col("__c"), F.col("__p").alias("__q")
    )
    paired = shares.where(F.col("__s") != ref_stratum).join(
        F.broadcast(ref), "__c"
    )
    m = (F.col("__p") + F.col("__q")) / 2
    # x * ln(x/m) with the 0*ln(0) := 0 convention
    term = lambda x: F.when(x > 0, x * F.log(x / m)).otherwise(F.lit(0.0))  # noqa: E731
    return (
        paired.groupBy("__s")
        .agg(
            F.sum("__n").cast("long").alias("n_docs"),
            F.round(F.sum(0.5 * term(F.col("__p")) + 0.5 * term(F.col("__q"))), 4).alias(
                "jsd"
            ),
        )
        .select(F.col("__s").alias(stratum_col), "n_docs", "jsd")
    )


def ks_statistic(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    ref_stratum: str,
) -> DataFrame:
    """Two-sample KS statistic per stratum vs the reference stratum.

    Returns ``stratum, n_cand, n_ref, ks`` (4 decimals).  Ties are
    handled by grouping per distinct value before the ECDF cumsum, so
    the statistic is evaluated after each value's full mass lands.
    """
    v = F.col(value_col).cast("double")
    base = df.select(F.col(stratum_col).alias("__s"), v.alias("__v"))
    cand = base.where(F.col("__s") != ref_stratum)
    refv = base.where(F.col("__s") == ref_stratum).select("__v")
    strata = cand.select("__s").distinct()
    # the reference sample is the yardstick for EVERY stratum
    ref_rep = strata.crossJoin(refv).select(
        "__s", "__v", F.lit(0).alias("__is_cand"), F.lit(1).alias("__is_ref")
    )
    cand_tag = cand.select(
        "__s", "__v", F.lit(1).alias("__is_cand"), F.lit(0).alias("__is_ref")
    )
    merged = (
        cand_tag.unionByName(ref_rep)
        .groupBy("__s", "__v")
        .agg(F.sum("__is_cand").alias("__c"), F.sum("__is_ref").alias("__r"))
    )
    w = Window.partitionBy("__s").orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy("__s")
    ecdf = merged.select(
        "__s",
        (F.sum("__c").over(w) / F.sum("__c").over(tot)).alias("__ec"),
        (F.sum("__r").over(w) / F.sum("__r").over(tot)).alias("__er"),
        F.sum("__c").over(tot).alias("__nc"),
        F.sum("__r").over(tot).alias("__nr"),
    )
    return ecdf.groupBy("__s").agg(
        F.max("__nc").cast("long").alias("n_cand"),
        F.max("__nr").cast("long").alias("n_ref"),
        F.round(F.max(F.abs(F.col("__ec") - F.col("__er"))), 4).alias("ks"),
    ).select(F.col("__s").alias(stratum_col), "n_cand", "n_ref", "ks")
