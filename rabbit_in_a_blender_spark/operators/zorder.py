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
    # Non-numeric dimensions have no meaningful order to preserve, but
    # equality pruning still wins from grouping equal values: hash them
    # to a stable numeric proxy first (files then cover few distinct
    # hash buckets → few distinct strings → min/max still prunes
    # point lookups after the scan pushes the predicate down).
    numeric = {"int", "bigint", "smallint", "tinyint", "double", "float",
               "decimal"}
    dtypes = dict(df.dtypes)

    def _as_num(c: str):
        base = dtypes.get(c, "").split("(")[0]
        # Temporal types refuse a direct double cast (ADVICE r5):
        # dates go through days-since-epoch, timestamps cast cleanly.
        if base == "date":
            return F.unix_date(F.col(c)).cast("double")
        if base in ("timestamp", "timestamp_ntz"):
            return F.col(c).cast("timestamp").cast("double")
        if base in numeric:
            return F.col(c).cast("double")
        # pmod, not abs-%: abs(Long.MIN_VALUE) overflows negative in
        # Java, which would yield a negative bucket index (VERDICT r5)
        return F.pmod(F.xxhash64(F.col(c)), F.lit(1_000_000)).cast("double")

    casted = df.select(*[_as_num(c).alias(c) for c in cols])
    # ONE data pass for all dimensions: approxQuantile takes a column
    # list (VERDICT r5 — the per-column loop scanned the data k times)
    all_bounds = dict(zip(cols, casted.approxQuantile(cols, probs, rel_err)))
    bucket_cols = []
    for c in cols:
        bounds = all_bounds[c]
        # dedupe boundaries so constant-ish columns degrade gracefully
        uniq = sorted(set(bounds))
        arr = F.array(*[F.lit(float(b)) for b in uniq])
        val = _as_num(c)  # same proxy as the boundary computation
        idx = F.coalesce(
            F.aggregate(
                arr,
                F.lit(0),
                lambda acc, b: acc
                + F.when(b <= val, F.lit(1)).otherwise(F.lit(0)),
            ),
            F.lit(0),
        )
        # Spread the occupied bucket range over all 8 bits: a
        # low-cardinality dimension (k distinct values → buckets 0..k)
        # would otherwise leave its HIGH bits constant zero, and coarse
        # file splits — which cut on the top interleaved bits — would
        # ignore it entirely.
        scale = 255.0 / max(len(uniq), 1)
        scaled = F.floor(idx * F.lit(scale)).cast("long")
        bucket_cols.append(F.least(scaled, F.lit(255)))
    return _interleave(bucket_cols)


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
