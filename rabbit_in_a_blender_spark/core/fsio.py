"""Filesystem-facing IO probes and sinks.

Split out of ``core/io.py`` (VERDICT r7 task 4): ``core.io`` sits in
the import closure of nearly every catalog query via ``load_tables``,
so a one-function change to a warehouse/streaming helper there flagged
~150 queries stale in the verification rotation.  Helpers that touch
the filesystem but NOT the testdata loaders live here; only the
streaming sinks and the CLI import this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def parquet_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` holds a readable parquet dataset — through the
    session's Hadoop FileSystem, so it answers correctly on HDFS/S3
    paths too (ADVICE r6: an ``os.path`` probe silently reports 'no
    index' for every non-local URI, which made the streaming corpus
    screen admit near-duplicates unchecked).  A present-but-empty
    directory counts as absent (schema inference would fail)."""
    from pyspark.errors import AnalysisException

    try:
        spark.read.parquet(path).schema
        return True
    except AnalysisException:
        return False


def atomic_overwrite(df: DataFrame, path: str) -> None:
    """Atomic-rebuild sink: the reference's CREATE OR REPLACE TABLE ... AS
    (SURVEY §2 A7; bq:etl/{omop_table}_merge.sql.jinja:3-12) re-expressed.

    Parquet overwrite in Spark stages to _temporary and commits via rename,
    which is atomic per-directory on HDFS-like filesystems. For
    object-store deployments swap in Delta and ``mode("overwrite")`` on a
    table; the call-site contract (all-or-nothing replace) is identical.
    """
    df.write.mode("overwrite").parquet(path)
