"""Table statistics — the ANALYZE TABLE analog for path-based tables.

BigQuery keeps table metadata (row counts, logical bytes, per-column
profiles) server-side and its optimizer uses them silently; Spark's
CBO wants `ANALYZE TABLE ... COMPUTE STATISTICS`, which needs a
catalog entry our parquet-dir warehouse doesn't have.  This module
closes the gap for the path-based layout:

- :func:`analyze_table` — ONE aggregate pass over the table computes
  row count and per-column (nulls, ndv, min, max); the physical size
  comes from the file listing (no data read).  Everything lands in a
  ``_STATS`` JSON sidecar in the table dir, stamped with the pointer
  version it describes, so a later write invalidates it detectably.
- :func:`table_stats` — read the sidecar back (None when absent or
  stale versus the live version).
- :func:`suggest_broadcast` — the sizing decision the stats exist
  for: is this table safely under the broadcast-join threshold?

NDV uses ``approx_count_distinct`` (HyperLogLog++, one pass, merges
at any scale) by default; ``exact=True`` swaps in ``countDistinct``
— the oracle-comparable twin for the hash gate, fine at test scale,
NOT the 100 TB path.  The whole profile is one job with partial
aggregation: no shuffle wider than one row per partition.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

STATS = "_STATS"

#: Spark's own default for autoBroadcastJoinThreshold.
DEFAULT_BROADCAST_BYTES = 10 * 1024 * 1024


def _stats_path(wh, zone: str, table: str) -> str:
    return wh.path(zone, table).rstrip("/") + "/" + STATS


def analyze_table(
    wh,
    spark: SparkSession,
    zone: str,
    table: str,
    columns: list[str] | None = None,
    exact: bool = False,
    persist: bool = True,
) -> dict:
    """Profile the table in one aggregate pass and (by default) persist
    the ``_STATS`` sidecar.  Returns the stats dict::

        {"n_rows": ..., "n_bytes": ..., "version": ...,
         "columns": {col: {"nulls": ..., "ndv": ...,
                           "min": str|None, "max": str|None}}}

    ``columns=None`` profiles every column.  min/max are stringified
    (stable across engines and JSON-safe); complex-typed columns
    (arrays/maps/structs/binary) get nulls only.
    """
    from ..core.commit import current_version, fs_for, is_pointer_table

    df = wh.read(spark, zone, table)
    cols = [c for c in df.columns if columns is None or c in columns]
    simple = {
        f.name: not f.dataType.typeName()
        in ("array", "map", "struct", "binary")
        for f in df.schema.fields
    }
    ndv_fn = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls")
        )
        if simple[c]:
            aggs += [
                ndv_fn(F.col(c)).alias(f"{c}__ndv"),
                F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            ]
    row = df.agg(*aggs).collect()[0]

    target = wh.path(zone, table)
    fs = fs_for(target)
    data_dir = wh._data_path(zone, table)
    n_bytes = sum(
        size
        for fpath, size in fs.walkfiles(data_dir)
        if fpath.endswith(".parquet")
    )
    stats = {
        "n_rows": int(row["__n"]),
        "n_bytes": int(n_bytes),
        "version": (
            current_version(target) if is_pointer_table(target) else None
        ),
        "exact_ndv": bool(exact),
        "columns": {},
    }
    for c in cols:
        entry = {"nulls": int(row[f"{c}__nulls"])}
        if simple[c]:
            entry.update(
                ndv=int(row[f"{c}__ndv"]),
                min=row[f"{c}__min"],
                max=row[f"{c}__max"],
            )
        stats["columns"][c] = entry
    if persist:
        fs.write_text_atomic(
            _stats_path(wh, zone, table), json.dumps(stats, sort_keys=True)
        )
    return stats


def table_stats(wh, zone: str, table: str) -> dict | None:
    """The persisted profile, or None when absent — or STALE: a
    pointer table whose live version moved past the recorded one
    returns None, so a consumer can never size a join from stats that
    describe replaced data."""
    from ..core.commit import current_version, fs_for, is_pointer_table

    target = wh.path(zone, table)
    fs = fs_for(target)
    p = _stats_path(wh, zone, table)
    if not fs.isfile(p):
        return None
    stats = json.loads(fs.read_text(p))
    if is_pointer_table(target) and stats.get("version") != current_version(
        target
    ):
        return None
    return stats


def suggest_broadcast(
    wh,
    zone: str,
    table: str,
    threshold_bytes: int = DEFAULT_BROADCAST_BYTES,
) -> bool | None:
    """True/False when fresh stats exist (physical bytes under the
    broadcast threshold — the sizing decision the profile is for),
    None when there are no usable stats."""
    stats = table_stats(wh, zone, table)
    if stats is None:
        return None
    return stats["n_bytes"] <= threshold_bytes
