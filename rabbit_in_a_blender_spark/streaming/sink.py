"""Streaming → warehouse sink: foreachBatch micro-batch upsert.

The reference is batch-only; this is the extension that closes the loop —
a Structured Streaming query whose micro-batches MERGE into a warehouse
table (same upsert semantics as operators/joins.py::merge_upsert, J10).

Scale notes:
- foreachBatch gives exactly-once per micro-batch when paired with a
  checkpoint location: replayed batches re-merge idempotently because
  the upsert is keyed.
- each micro-batch merge reads the current table; for fact-sized targets
  swap the overwrite-reconcile for Delta MERGE (same call-site contract).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from ..operators.joins import merge_upsert
from ..pipeline.warehouse import Warehouse


def stream_upsert_query(
    stream_df: DataFrame,
    warehouse: Warehouse,
    zone: str,
    table: str,
    keys: Sequence[str],
    checkpoint_dir: str,
):
    """Build (not start) a writeStream that upserts each micro-batch.

    Returns the DataStreamWriter so callers pick the trigger
    (availableNow for backfill, processingTime for continuous).
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.dropDuplicates(list(keys))
        if warehouse.exists(zone, table):
            target = warehouse.read(batch_df.sparkSession, zone, table)
            merged = merge_upsert(target, batch_df, list(keys))
        else:
            merged = batch_df
        warehouse.write(merged, zone, table)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
