"""Sequence packing for LLM training-data pipelines: assign documents to
fixed-token-budget bins (the step that turns a deduped corpus into
training sequences of ~budget tokens each).

Semantics: **next-fit in key order within deterministic key-range
groups**.  Documents are processed in ascending id order inside each
group; a document goes into the current bin unless it would overflow the
budget, in which case a new bin opens.  A single document larger than
the budget gets a bin of its own (never split, never dropped — the
caller filters oversized docs if that is the policy).

Why groups: packing is inherently a sequential fold, which cannot
distribute.  Grouping by ``id // group_span`` bounds each fold to a
fixed id range so (a) thousands of groups pack in parallel across
executors, (b) the grouping is a pure function of the data — NOT of
partition count — so results are identical on any cluster, and (c) each
group's rows fit comfortably in one Arrow batch.  The waste vs a global
sequential pack is at most one under-filled bin per group.

Implementation: ``applyInPandas`` — the documented escape hatch for
per-group stateful logic Spark's operators cannot express (the fold over
running bin load).  Everything before it is narrow; the only shuffle is
the groupBy on the derived group key.

Global bin ids are ``group_key * 2**32 + local_bin`` — unique and
deterministic without any driver-side coordination or
monotonically_increasing_id.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN_STRIDE = 2**32


def pack_next_fit(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    group_span: int = 1024,
) -> DataFrame:
    """(id, n_tokens, bin_id) with next-fit packing per id-range group.

    bin_id = (id // group_span) * 2^32 + local bin index; bins satisfy
    sum(tokens) <= budget except singleton oversized docs.
    """
    out_schema = f"{id_col} long, {tokens_col} long, bin_id long"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        group_key = int(pdf["__grp"].iloc[0])
        bins, load, current = [], 0, 0
        for t in pdf[tokens_col].astype("int64"):
            if load > 0 and load + t > budget:
                current += 1
                load = 0
            load += int(t)
            bins.append(group_key * _BIN_STRIDE + current)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].astype("int64"),
                tokens_col: pdf[tokens_col].astype("int64"),
                "bin_id": pd.Series(bins, dtype="int64", index=pdf.index),
            }
        )

    prepared = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        F.floor(F.col(id_col).cast("long") / F.lit(group_span)).alias("__grp"),
    )
    return prepared.groupBy("__grp").applyInPandas(_pack, schema=out_schema)


def bin_summary(packed: DataFrame, tokens_col: str) -> DataFrame:
    """Per-bin fill statistics: doc count, token load."""
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(tokens_col).cast("long").alias("bin_tokens"),
    )
