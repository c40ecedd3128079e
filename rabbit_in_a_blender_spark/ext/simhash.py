"""SimHash document fingerprinting (64-bit), JVM-expression-only.

Scheme (deterministic and oracle-expressible in DuckDB):
- token hash = first 16 hex chars of md5(token) → 64 bits;
- per bit b: weight +1 if bit set else -1, summed over the document's
  DISTINCT tokens;
- simhash bit b = (sum > 0) → emitted as a 64-char '0'/'1' string.

Near-duplicate candidates share a 16-bit band (4 bands → Hamming
distance ≤ 3 guaranteed caught; standard SimHash LSH).

Scale: one explode (doc → distinct tokens) + one groupBy(doc) computing
64 conditional sums — a single shuffle of (doc_id, token-hash) pairs;
the 64 aggregates are map-side combined.  No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def _bit_expr(b: int) -> str:
    """SQL expression for bit b (0 = MSB) of the 64-bit token hash.

    Uses instr() on the hex alphabet — portable to the DuckDB oracle
    (strpos) without relying on conv()."""
    pos = b // 4 + 1  # hex char position (1-based)
    shift = 3 - b % 4
    return (
        f"cast((shiftright(instr('{HEX}', substring(__th, {pos}, 1)) - 1, {shift}) & 1) as int)"
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """(id, simhash) with simhash a {bits}-char '0'/'1' string."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("__tok"),
    ).withColumn("__th", F.substring(F.md5(F.col("__tok")), 1, bits // 4))
    sums = toks.groupBy(id_col).agg(
        *[
            F.sum(F.expr(f"case when {_bit_expr(b)} = 1 then 1 else -1 end")).alias(
                f"__s{b}"
            )
            for b in range(bits)
        ]
    )
    bitchars = [
        F.when(F.col(f"__s{b}") > 0, F.lit("1")).otherwise(F.lit("0")) for b in range(bits)
    ]
    return sums.select(F.col(id_col), F.concat(*bitchars).alias("simhash"))


def simhash_candidate_pairs(
    sig: DataFrame, id_col: str, bits: int = 64, bands: int = 4
) -> DataFrame:
    """LSH over simhash bands: pairs sharing any band are candidates."""
    width = bits // bands
    banded = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.substring("simhash", i * width + 1, width).alias("band_val"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, "b.band_idx", "b.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def hamming_distance(col_a, col_b) -> F.Column:
    """Hamming distance between two equal-length bitstrings (JVM-side)."""
    return F.size(
        F.filter(
            F.zip_with(
                F.split(col_a, ""),
                F.split(col_b, ""),
                lambda x, y: x != y,
            ),
            lambda v: v,
        )
    )
