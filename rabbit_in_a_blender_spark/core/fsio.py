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


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    partition_by: list[str] | None = None,
) -> tuple[int, int]:
    """Rewrite an append-decayed parquet directory into ~``target_file_mb``
    files; returns (files_before, files_after).

    Every foreachBatch sink in streaming/sink.py appends per micro-batch
    — a week of 1-minute triggers decays a table into ~10k tiny files
    whose per-file open/footer cost dominates scans long before data
    size does (the classic small-files problem).  Compaction reads the
    dir once, repartitions to ceil(total_bytes / target_file_mb), and
    swaps via a staged sibling dir + rename (the warehouse atomic-
    rebuild recipe — never an in-place overwrite, so a crash leaves the
    old table intact and a concurrent reader sees old-or-new, not
    half).  With ``partition_by`` the staging write keeps the partition
    layout (repartitioned ON those keys so each partition dir compacts
    to its own files and scan-level pruning is preserved).

    Data-neutral by construction: same rows, same schema (equality
    pytest-pinned).  Local-path rename semantics; on object stores use
    Delta OPTIMIZE — the call-site contract is identical.
    """
    import math
    import os
    import shutil

    def _walk(p: str) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(p):
            out += [
                os.path.join(root, f)
                for f in files
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            ]
        return out

    before = _walk(path)
    total_bytes = sum(os.path.getsize(f) for f in before)
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + ".__staging__"
    shutil.rmtree(staging, ignore_errors=True)
    if partition_by:
        keys = [k for k in partition_by if k in df.columns]
        df.repartition(max(n_files, 1), *keys).write.mode(
            "overwrite"
        ).partitionBy(*keys).parquet(staging)
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(staging)
    old = path.rstrip("/") + ".__old__"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old, ignore_errors=True)
    return len(before), len(_walk(path))
