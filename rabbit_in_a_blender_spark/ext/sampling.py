"""Deterministic sampling and dataset-split operators for training-data
pipelines: uniform sampling, per-stratum sampling, and train/val/test
split assignment.

Design: every decision is a pure function of ``md5(key ':' seed)`` — no
RNG state, no partition-order dependence.  The first 8 hex chars of the
digest are compared lexicographically against a precomputed hex
threshold, which keeps the operator

- **reproducible**: the same (key, seed) lands in the same sample/split
  on any cluster size, any partitioning, any engine;
- **oracle-checkable**: DuckDB's ``md5()`` produces the identical
  lowercase hex, so the CORRECTNESS gate can replay the exact decision;
- **scale-free**: sampling is a narrow ``filter`` and split assignment a
  narrow ``select`` — zero shuffles, zero driver traffic, pushdown-
  friendly at 100 TB.  (Contrast ``DataFrame.sample``, whose Bernoulli
  draw is partition-order dependent and irreproducible across engines.)

The same hash-prefix trick is what production dataset tooling uses for
stable holdout membership (a row's split must not flicker when the
corpus is re-sharded or grows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 8 hex chars = 32 bits of the digest: plenty of resolution for
# per-mille fractions while keeping thresholds human-readable.
_PREFIX_LEN = 8
_SPACE = 16**_PREFIX_LEN


def hash_bucket(key: Column, seed: str) -> Column:
    """First 8 hex chars of md5("<key>:<seed>") — a uniform draw in
    [0, 16^8) encoded as a lexicographically ordered hex string.

    Oracle equivalent: ``substr(md5(CAST(k AS VARCHAR) || ':<seed>'), 1, 8)``.
    """
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(f":{seed}"))), 1, _PREFIX_LEN
    )


def fraction_threshold(fraction: float) -> str:
    """Hex threshold t such that P[hash_bucket < t] == round(fraction * 16^8) / 16^8.

    A fraction whose rounded threshold covers the whole space returns
    the sentinel 'g' (sorts above every hex string, keeps everything).
    The sentinel must also cover fractions that merely ROUND to 16^8
    (e.g. 1 - 1e-16): formatting 16^8 itself would yield the 9-char
    '100000000', which sorts lexicographically BELOW most 8-char
    thresholds and would silently keep ~6% instead of ~100%.
    """
    n = max(int(round(fraction * _SPACE)), 0)
    if n >= _SPACE:
        return "g"  # every hex char < 'g'
    return format(n, "08x")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = "sample"
) -> DataFrame:
    """Keep rows whose hash bucket falls below the fraction threshold.

    A narrow filter: no shuffle, no RNG, stable under re-partitioning and
    corpus growth (a kept key stays kept when new rows arrive).
    """
    return df.filter(
        hash_bucket(F.col(key_col), seed) < F.lit(fraction_threshold(fraction))
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    seed: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` semantics, but
    reproducible): each stratum gets its own keep-fraction; strata not
    listed fall back to ``default_fraction``.

    Still a narrow filter — the stratum threshold is a CASE expression,
    not a join.
    """
    thr = F.lit(fraction_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(fraction_threshold(frac))
        ).otherwise(thr)
    return df.filter(hash_bucket(F.col(key_col), seed) < thr)


def upsample_epochs(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    epochs: dict[str, float],
    seed: str = "epochs",
    default_epochs: float = 1.0,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Deterministic fractional upsampling: repeat each row
    floor(epochs[stratum]) times, plus one more copy iff the row's hash
    falls under the fractional remainder — so a source weighted 2.3
    contributes every doc twice and a stable, reproducible 30% of its
    docs a third time (the standard LLM data-mixing recipe when
    high-quality sources run for >1 epoch).

    Adds ``copy_col`` (1-based repeat index) so downstream shuffling can
    spread copies apart.  Spark shape: one ``explode(sequence(...))`` —
    a narrow fan-out, no shuffle, no RNG; the same (key, stratum, seed)
    always yields the same copy count on any engine or partitioning.

    ``epochs`` values must be >= 0; a stratum at 0 drops out entirely
    (its fractional threshold keeps ~nothing and floor is 0).
    """
    floor_e = F.lit(int(default_epochs))
    thr = F.lit(fraction_threshold(default_epochs - int(default_epochs)))
    for value, e in sorted(epochs.items()):
        if e < 0:
            raise ValueError(f"epochs for {value!r} must be >= 0, got {e}")
        floor_e = F.when(F.col(strata_col) == value, F.lit(int(e))).otherwise(
            floor_e
        )
        thr = F.when(
            F.col(strata_col) == value,
            F.lit(fraction_threshold(e - int(e))),
        ).otherwise(thr)
    extra = F.when(
        hash_bucket(F.col(key_col), seed) < thr, F.lit(1)
    ).otherwise(F.lit(0))
    n_copies = (floor_e + extra).cast("int")
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn(
            copy_col, F.explode(F.sequence(F.lit(1), F.col("__n")))
        )
        .drop("__n")
    )


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    seed: str = "split",
    names: tuple[str, str, str] = ("train", "val", "test"),
) -> DataFrame:
    """Assign every row a stable split label from cumulative hash ranges.

    weights are normalized; boundaries are cumulative-fraction hex
    thresholds, so the three ranges partition the hash space exactly and
    a row's split never changes when the corpus is re-sharded or grows.
    Adds a ``split`` string column; narrow projection, zero shuffle.
    """
    total = sum(weights)
    c1 = fraction_threshold(weights[0] / total)
    c2 = fraction_threshold((weights[0] + weights[1]) / total)
    b = hash_bucket(F.col(key_col), seed)
    split = (
        F.when(b < F.lit(c1), names[0])
        .when(b < F.lit(c2), names[1])
        .otherwise(names[2])
    )
    return df.withColumn("split", split)


def balance_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weight_col: str,
    seed: str = "mix",
) -> DataFrame:
    """Rebalance strata to the smallest stratum's total weight: each
    stratum is deterministically down-sampled with fraction
    ``min_stratum_weight / stratum_weight`` so every stratum contributes
    ~the same weight (tokens, bytes) to the output — the source-mixture
    step of a pretraining pipeline ("equal token budget per domain").

    The per-stratum fractions are DERIVED FROM THE DATA, and the hex
    thresholds are computed inside the plan (`hex(floor(target / w *
    16^8))`), so the whole decision remains engine-reproducible and
    oracle-checkable — no driver-side collect, no RNG.  Cost: one
    weight aggregation over (strata, weight) pairs + a broadcast of the
    per-stratum thresholds (stratum-count rows) + the narrow hash
    filter.
    """
    w = df.groupBy(strata_col).agg(F.sum(weight_col).cast("double").alias("__w"))
    target = w.agg(F.min("__w").alias("__target"))
    thr = (
        w.crossJoin(F.broadcast(target))
        .select(
            strata_col,
            F.when(F.col("__w") <= F.col("__target"), F.lit("g"))
            .otherwise(
                F.lower(
                    F.lpad(
                        F.hex(
                            F.floor(
                                F.col("__target") / F.col("__w") * F.lit(float(_SPACE))
                            ).cast("bigint")
                        ),
                        8,
                        "0",
                    )
                )
            )
            .alias("__thr"),
        )
    )
    return (
        df.join(F.broadcast(thr), strata_col)
        .filter(hash_bucket(F.col(key_col), seed) < F.col("__thr"))
        .drop("__thr")
    )


def temperature_epochs(
    totals: dict[str, int], alpha: float = 0.5, total: int | None = None
) -> dict[str, float]:
    """Per-stratum epoch factors for temperature-weighted mixing: the
    standard multilingual/multi-source recipe p_i ∝ n_i^alpha (alpha<1
    flattens the distribution toward small sources).

    ``totals`` maps stratum → token count; the returned factor e_i =
    (n_i^alpha / Σ n^alpha) · T / n_i feeds :func:`upsample_epochs`
    directly — e_i < 1 downsamples, e_i > 1 repeats epochs, both via
    the same hash-gated copies.  T defaults to Σ n (re-mix at the same
    size).  The weight sum accumulates in sorted-stratum order so an
    engine replaying the arithmetic (the DuckDB oracle uses
    ``SUM(... ORDER BY ...)``) adds the same doubles in the same
    sequence.
    """
    import math

    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")

    def w(n: float) -> float:
        # alpha 0.5 via sqrt: correctly rounded in IEEE 754, so an SQL
        # oracle using sqrt() reproduces the double bit-for-bit (pow's
        # rounding is not guaranteed across libms)
        return math.sqrt(n) if alpha == 0.5 else math.pow(n, alpha)

    wsum = 0.0
    for s in sorted(totals):
        wsum += w(float(totals[s]))
    t = float(total if total is not None else sum(totals.values()))
    return {
        s: (w(float(n)) / wsum) * t / float(n)
        for s, n in totals.items()
        if n > 0
    }


def temperature_mixture(
    df,
    key_col: str,
    strata_col: str,
    token_col,
    alpha: float = 0.5,
    total: int | None = None,
    seed: str = "temp",
):
    """Temperature-sampled corpus mix in one pass: aggregate per-stratum
    token totals (driver-side #strata rows — metadata), derive epoch
    factors via :func:`temperature_epochs`, and apply them with
    :func:`upsample_epochs` (floor copies + one stable hash-gated
    extra; explode fan-out, zero shuffle beyond the totals agg)."""
    rows = (
        df.groupBy(strata_col)
        .agg(F.sum(F.col(token_col).cast("long")).alias("__n"))
        .collect()
    )
    totals = {r[strata_col]: int(r["__n"] or 0) for r in rows}
    epochs = temperature_epochs(totals, alpha=alpha, total=total)
    return upsample_epochs(df, key_col, strata_col, epochs, seed=seed)


def per_group_cap(
    df: DataFrame,
    key_col: str,
    group_col: str,
    cap: int,
    seed: str = "cap",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by deterministic hash
    order — the FineWeb/C4-style per-domain cap that stops a single
    crawler-friendly host from dominating the corpus.

    Selection ranks rows inside each group by (hash_bucket(key), key):
    reproducible across runs and layouts, unbiased w.r.t. document
    content, and stable under corpus growth in the sense that a
    dropped key can only be displaced by a lower-hashing newcomer.

    Plan: one hash-partitioned window per group (the shuffle is on
    group_col); skew-prone giant groups are exactly the rows the cap
    discards, and the rank short-circuits at cap so the window state
    is bounded.  Oracle: ROW_NUMBER() OVER (PARTITION BY g ORDER BY
    md5-prefix, key) <= cap.
    """
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def weighted_group_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    weight_col: str,
    k: int,
    seed: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: k rows per group, where a
    row's selection probability is proportional to ``weight_col`` —
    the Efraimidis-Spirakis A-ES scheme on deterministic draws
    (quality-weighted corpus selection: sample harder from high-quality
    strata without ever fully dropping the tail).

    Each row gets priority ln(u) / w with u a uniform draw derived from
    the md5 hash prefix (u in (0, 1], never 0 — +1 on the integer
    prefix) and w its weight; the k HIGHEST priorities per group win —
    equivalent to u^(1/w) ranking but cheaper and monotone-identical.
    Non-positive weights never win against any positive weight (their
    priority is forced to -infinity via the weight guard); a group with
    fewer than k positive-weight rows keeps only those.

    Deterministic across engines: the md5 prefix -> integer -> double
    division and ln are bit-identical IEEE ops in Spark and DuckDB, so
    the priority ORDER (ties broken by key) reproduces exactly.  One
    shuffle on the group key, rank short-circuits at k.
    """
    u = (
        F.conv(hash_bucket(F.col(key_col), seed), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(_SPACE))
    priority = F.when(
        F.col(weight_col) > 0, F.log(u) / F.col(weight_col)
    ).otherwise(F.lit(float("-inf")))
    w = Window.partitionBy(group_col).orderBy(
        priority.desc(), F.col(key_col)
    )
    return (
        df.withColumn("__pri", priority)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") <= k) & (F.col(weight_col) > 0))
        .drop("__rn", "__pri")
    )
