"""Query catalog: named (PySpark query, DuckDB oracle SQL) pairs.

Each SURVEY.md §2 operator lands here as a registered query over the
driver testdata tables, together with the ANSI-SQL oracle the driver runs
in DuckDB (CORRECTNESS gate, see /root/repo/__spark_entry__.py).

Conventions that keep Spark and DuckDB hash-identical:
- alias every computed column identically on both sides;
- CAST count/sum/length outputs to BIGINT on both sides (DuckDB sums
  integers into HUGEINT, len() is BIGINT, Spark uses long);
- ROUND floating-point aggregates (3-4 decimals) on both sides so
  partial-aggregation order differences can't leak into the hash;
- format timestamps to 'yyyy-MM-dd HH:mm:ss' strings on both sides
  (engine-native timestamp rendering differs);
- deterministic ORDER BY everywhere a window/limit could tie-break.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_MODULES = (
    "rabbit_in_a_blender_spark.plans.parity",
    "rabbit_in_a_blender_spark.plans.analytics",
    "rabbit_in_a_blender_spark.plans.extras",
    "rabbit_in_a_blender_spark.plans.quality",
    "rabbit_in_a_blender_spark.plans.extensions",
    "rabbit_in_a_blender_spark.plans.llmprep",
    "rabbit_in_a_blender_spark.plans.streaming_batch",
    "rabbit_in_a_blender_spark.plans.timeseries",
    "rabbit_in_a_blender_spark.plans.sources",
    "rabbit_in_a_blender_spark.plans.passages",
)

_REGISTRY: dict[str, "CatalogQuery"] = {}
_loaded = False


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records rows-only check
    doc: str = ""


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"duplicate catalog query: {name}")
        _REGISTRY[name] = CatalogQuery(name, fn, oracle, doc)
        return fn

    return deco


def _load() -> None:
    global _loaded
    if not _loaded:
        for m in _MODULES:
            importlib.import_module(m)
        _loaded = True


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Every catalog query, in stable registration order.

    Library API: the order never depends on the environment.  The
    driver-facing unverified-first rotation (which *samples* this
    catalog under a per-round cap) lives in /root/repo/__spark_entry__.py —
    the harness that owns the CORRECTNESS_r*.json artifacts.
    """
    _load()
    return {name: q.fn for name, q in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    """DuckDB oracle SQL per query, stable registration order."""
    _load()
    return {
        name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None
    }


def get(name: str) -> CatalogQuery:
    _load()
    return _REGISTRY[name]
