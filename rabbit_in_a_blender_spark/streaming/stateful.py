"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2.M extension surface — the reference is batch-only).

``running_counts`` keeps a per-key running aggregate across micro-batches
with timeout-based state eviction — the canonical custom-stateful shape
Spark's built-in windows can't express (e.g. cumulative per-user counters
that survive across windows).

Scale: state lives in the executor state store partitioned by key;
memory is bounded by (active keys × state row), and the processing-time
timeout evicts idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    state.setTimeoutDuration(3600 * 1000)  # evict after 1h idle
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 3)]}
    )


def running_counts(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, sum) maintained across micro-batches.

    ``events`` must be a streaming DataFrame with user_id and value.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
