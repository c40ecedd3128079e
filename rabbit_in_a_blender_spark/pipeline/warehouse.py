"""Zone-structured warehouse (SURVEY §1.1: raw / work / omop / dqd /
achilles namespaces — reference README.md:22, cli.py:62-65).

Local tests use parquet dirs under one root; on a cluster the same layout
maps to catalog databases or object-store prefixes.  Writes are atomic
rebuilds (A7 semantics) via parquet overwrite — swap in Delta tables for
object stores without atomic rename.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

ZONES = ("raw", "work", "omop", "dqd", "achilles")


class Warehouse:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, zone: str, table: str) -> str:
        assert zone in ZONES, zone
        return os.path.join(self.root, zone, table)

    def exists(self, zone: str, table: str) -> bool:
        p = self.path(zone, table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    def read(self, spark: SparkSession, zone: str, table: str) -> DataFrame:
        return spark.read.parquet(self.path(zone, table))

    def write(self, df: DataFrame, zone: str, table: str) -> None:
        """Atomic rebuild (CREATE OR REPLACE TABLE ... AS semantics).

        Staged write + rename: the plan may lazily READ the table being
        replaced (e.g. swap-table extension on re-runs) — a plain
        overwrite would delete the input files mid-job.  Rename is atomic
        on posix/HDFS; on object stores swap in Delta instead.
        """
        target = self.path(zone, table)
        staging = target + ".__staging__"
        shutil.rmtree(staging, ignore_errors=True)
        df.write.mode("overwrite").parquet(staging)
        old = target + ".__old__"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(target):
            os.rename(target, old)
        os.rename(staging, target)
        shutil.rmtree(old, ignore_errors=True)

    def append(self, df: DataFrame, zone: str, table: str) -> None:
        df.write.mode("append").parquet(self.path(zone, table))

    def drop(self, zone: str, table: str) -> None:
        shutil.rmtree(self.path(zone, table), ignore_errors=True)

    def list_tables(self, zone: str) -> list[str]:
        zdir = os.path.join(self.root, zone)
        if not os.path.isdir(zdir):
            return []
        return sorted(
            d for d in os.listdir(zdir) if os.path.isdir(os.path.join(zdir, d))
        )
