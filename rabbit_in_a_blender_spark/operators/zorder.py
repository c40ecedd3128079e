"""Z-order (Morton) clustering for multi-dimensional scan pruning.

``Warehouse.write(cluster_by=...)`` range-partitions + sorts on ONE key
sequence: files are narrow in the leading key and full-range in every
other.  When two or more columns are independently selective (person_id
AND observation date; source AND language), interleaving the bits of
their rank buckets gives every file a narrow min/max range in ALL the
z-ordered dimensions at once — the same trick behind Delta's OPTIMIZE
ZORDER — so parquet rowgroup stats prune scans filtered on any of them.

Spark-first shapes:
- bucket boundaries come from ``approxQuantile`` (driver-side metadata:
  cols x buckets doubles — the documented exception to the no-collect
  rule, like the sequence-assign offsets);
- bucket assignment + bit interleave are pure JVM expressions
  (width_bucket, shiftleft, bitwise OR) — one narrow projection;
- the final layout is ``repartitionByRange(z) + sortWithinPartitions(z)``
  — exactly one range shuffle, same cost as 1-D clustering.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS_PER_DIM = 8  # 256 rank buckets per dimension


def _interleave(bucket_cols: list[Column]) -> Column:
    """Morton code: bit i of dim d lands at position i*ndims + d."""
    ndims = len(bucket_cols)
    terms = []
    for d, col in enumerate(bucket_cols):
        for i in range(BITS_PER_DIM):
            src = F.shiftright(col, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(src, i * ndims + d))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_key(
    df: DataFrame, cols: list[str], rel_err: float = 0.01
) -> Column:
    """A Morton-interleaved long over the columns' quantile buckets.

    Quantile bucketing (not raw values) makes the interleave robust to
    skew and to mixed column scales: every dimension contributes the
    same 8 bits of resolution regardless of its distribution.
    """
    probs = [i / 256 for i in range(1, 256)]
    casted = df.select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    )
    bucket_cols = []
    for c in cols:
        bounds = casted.approxQuantile(c, probs, rel_err)
        # width_bucket needs strictly usable boundaries; dedupe while
        # preserving order so constant-ish columns degrade gracefully
        uniq = sorted(set(bounds))
        arr = F.array(*[F.lit(b) for b in uniq])
        idx = F.coalesce(
            F.expr(
                f"aggregate(filter({_arr_sql(uniq)}, b -> b <= cast({c} as double)),"
                " 0, (acc, b) -> acc + 1)"
            ),
            F.lit(0),
        )
        del arr
        bucket_cols.append(F.least(idx, F.lit(255)).cast("long"))
    return _interleave(bucket_cols)


def _arr_sql(vals: list[float]) -> str:
    return "array(" + ",".join(f"cast({v!r} as double)" for v in vals) + ")"


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    num_files: int | None = None,
    rel_err: float = 0.01,
) -> DataFrame:
    """Return df laid out for writing: range-partitioned and sorted on
    the Morton key (dropped before write).  ``num_files`` sets the
    output partition count (else spark.sql.shuffle.partitions)."""
    z = zorder_key(df, cols, rel_err)
    out = df.withColumn("__z", z)
    parts = (
        out.repartitionByRange(num_files, "__z")
        if num_files
        else out.repartitionByRange("__z")
    )
    return parts.sortWithinPartitions("__z").drop("__z")
