"""Continuous distribution-drift monitor: cumulative PSI per stratum,
scored against a FIXED reference profile, updated every micro-batch.

The batch operator (`ext/drift.py::psi_drift`) answers "did this
snapshot move?"; this sink answers "is the live feed moving?" without
ever re-scanning history:

- the reference profile (quantile edges + smoothed shares, from
  ``ext.drift.fit_reference_profile``) is a handful of driver floats,
  broadcast into every batch as literals;
- each micro-batch is binned map-side and reduced to (stratum, bin)
  counts — the only state the monitor keeps, upserted into a counts
  table KEYED BY (batch_id, stratum, bin) so a replayed batch
  overwrites itself instead of double-counting (the same
  exactly-once-per-micro-batch contract as ``sink.stream_upsert_query``);
- the PSI report (one row per stratum, add-half smoothing identical to
  the batch operator) is recomputed from the tiny counts table and
  overwritten each batch.

State size: batches × strata × bins rows of counts — metadata at any
event volume.  A monitor fed the same reference profile converges to
exactly the batch ``psi_drift`` value over the same rows (pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.fsio import parquet_exists


def _bin_counts(
    batch_df: DataFrame, stratum_col: str, value_col: str, edges: list[float]
) -> DataFrame:
    v = F.col(value_col).cast("double")
    return (
        batch_df.select(
            F.col(stratum_col).alias("stratum"),
            F.aggregate(
                F.array(*[F.lit(float(e)) for e in edges]),
                F.lit(0),
                lambda acc, e: acc + F.when(v >= e, 1).otherwise(0),
            ).alias("bin"),
        )
        .groupBy("stratum", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _psi_report(counts: DataFrame, ref_shares: list[float]) -> DataFrame:
    n_bins = len(ref_shares)
    spark = counts.sparkSession
    totals = counts.groupBy("stratum").agg(F.sum("n").alias("n_total"))
    grid = totals.crossJoin(
        F.broadcast(spark.range(n_bins).select(F.col("id").cast("int").alias("bin")))
    )
    per_batch_summed = counts.groupBy("stratum", "bin").agg(F.sum("n").alias("n"))
    cells = grid.join(per_batch_summed, ["stratum", "bin"], "left").withColumn(
        "n", F.coalesce(F.col("n"), F.lit(0))
    )
    ref = F.array(*[F.lit(float(s)) for s in ref_shares])
    scored = cells.select(
        "stratum",
        "n_total",
        ((F.col("n") + F.lit(0.5)) / (F.col("n_total") + F.lit(0.5 * n_bins))).alias(
            "__p"
        ),
        F.element_at(ref, F.col("bin") + 1).alias("__q"),
    )
    return scored.groupBy("stratum").agg(
        F.max("n_total").cast("long").alias("n_docs"),
        F.round(
            F.sum((F.col("__p") - F.col("__q")) * F.log(F.col("__p") / F.col("__q"))), 4
        ).alias("psi"),
    )


def stream_drift_monitor(
    stream_docs: DataFrame,
    stratum_col: str,
    value_col: str,
    edges: list[float],
    ref_shares: list[float],
    counts_dir: str,
    report_dir: str,
    checkpoint_dir: str,
):
    """Build (not start) a writeStream maintaining a live PSI report.

    ``edges``/``ref_shares`` come from ``ext.drift.fit_reference_profile``
    on the reference corpus.  Returns the DataStreamWriter; callers pick
    the trigger (availableNow for backfill, processingTime for live).
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fresh = _bin_counts(batch_df, stratum_col, value_col, edges).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        if parquet_exists(spark, counts_dir):
            prior = spark.read.parquet(counts_dir).where(
                F.col("batch_id") != int(batch_id)  # replay overwrites itself
            )
            merged = prior.unionByName(fresh)
        else:
            merged = fresh
        # counts are batches x strata x bins rows — rewrite is metadata-
        # sized.  Stage first: `merged` still lazily reads counts_dir, so
        # overwriting it in place would clobber the read's source.
        staged = counts_dir.rstrip("/") + "__staged"
        merged.coalesce(1).write.mode("overwrite").parquet(staged)
        final = spark.read.parquet(staged)
        final.coalesce(1).write.mode("overwrite").parquet(counts_dir)
        _psi_report(final, ref_shares).coalesce(1).write.mode("overwrite").parquet(
            report_dir
        )

    return (
        stream_docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
