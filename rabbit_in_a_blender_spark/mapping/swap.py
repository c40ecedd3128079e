"""Swap-table key management — the reference's signature operator (§2.J).

A swap table maps a string source key ``x`` (plus the concept/event
columns that disambiguate multi-mapping) to a persistent int key ``y``.
Re-runs must never renumber: only unseen identities get new ids
(anti join, bq:etl/{primary_key_column}_swap_merge.sql.jinja:33-48), and
new ids continue from MAX(y) (G2 watermark).

Identity of a row = (x, *concept_cols, *event_cols) — one source row
mapped to k concepts yields k identities and k stable PKs
(merge join condition bq:etl/{omop_table}_merge.sql.jinja:81-95).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import null_safe_join
from ..operators.sequence import assign_ids, next_offset


def _identity_cols(key_col: str, concept_cols: Sequence[str], event_cols: Sequence[str]):
    return [key_col, *concept_cols, *event_cols]


def swap_merge(
    swap: DataFrame | None,
    identities: DataFrame,
    key_col: str = "x",
    concept_cols: Sequence[str] = (),
    event_cols: Sequence[str] = (),
    id_col: str = "y",
    offset: int = 0,
    mode: str = "scalable",
) -> DataFrame:
    """Insert unseen identities with fresh sequential ids; keep the rest.

    ``swap`` is the persistent table (None on first run).  Identity
    comparison is null-safe on concept/event columns — the reference uses
    IFNULL()=IFNULL() deliberately (J4; SURVEY §7 known-hard #2).
    """
    ident = _identity_cols(key_col, concept_cols, event_cols)
    new = identities.select(*ident).distinct()
    if swap is not None:
        ns_keys = [*concept_cols, *event_cols]
        new = null_safe_join(
            new, swap.select(*ident), ident, "left_anti", null_safe_keys=ns_keys
        )
        offset = max(offset, next_offset(swap, id_col))
    assigned = assign_ids(new, ident, offset=offset, out_col=id_col, mode=mode)
    assigned = assigned.select(*ident, F.col(id_col).cast("long").alias(id_col))
    if swap is None:
        return assigned
    return swap.select(*ident, id_col).unionByName(assigned)


def apply_pk_swap(
    upload: DataFrame,
    swap: DataFrame,
    key_col: str,
    concept_cols: Sequence[str] = (),
    event_cols: Sequence[str] = (),
    id_col: str = "y",
    out_col: str | None = None,
) -> DataFrame:
    """Replace the string prequel key by its swapped int PK.

    Inner join on the full identity with null-safe concept/event equality
    (J4, bq:etl/{omop_table}_merge.sql.jinja:81-95).  The swap table is
    key-sized (no payload) — at 100 TB this is a shuffle-on-key join of
    two co-partitionable tables; bucket both by ``x`` to avoid re-shuffle.
    """
    out_col = out_col or key_col
    ident = _identity_cols(key_col, concept_cols, event_cols)
    ns = [*concept_cols, *event_cols]
    swap_sel = swap.select(
        *[F.col(c).alias(f"__sw_{c}") for c in ident], F.col(id_col).alias("__sw_y")
    )
    cond = None
    for c in ident:
        k = (
            upload[c].eqNullSafe(swap_sel[f"__sw_{c}"])
            if c in ns
            else upload[c] == swap_sel[f"__sw_{c}"]
        )
        cond = k if cond is None else cond & k
    out = upload.join(swap_sel, cond, "inner")
    out = out.drop(*[f"__sw_{c}" for c in ident])
    return out.withColumn(out_col, F.col("__sw_y")).drop("__sw_y")


def apply_fk_swaps(
    df: DataFrame,
    fk_swaps: Mapping[str, DataFrame],
    required: Mapping[str, bool] | None = None,
    key_col: str = "x",
    id_col: str = "y",
) -> DataFrame:
    """Remap FK prequel columns through their parent swap tables (J3).

    One LEFT JOIN per FK column.  The swap side carries only (x, y) —
    but a PARENT swap is key-per-parent-row, which for person/visit
    parents is fact-sized at scale, so the broadcast-vs-shuffle choice
    is left to AQE's runtime size statistics (a forced broadcast of a
    100M-key person swap would OOM an executor; a dimension-sized swap
    still broadcasts automatically).  Required FKs default to 0 on
    miss, nullable FKs stay null (IFNULL routing in
    bq:etl/{omop_table}_merge.sql.jinja:36-48).
    """
    required = required or {}
    out = df
    for i, (fk_col, swap) in enumerate(fk_swaps.items()):
        alias = f"__fk{i}"
        sel = swap.select(
            F.col(key_col).alias(f"{alias}_x"), F.col(id_col).alias(f"{alias}_y")
        )
        out = out.join(
            sel, out[fk_col] == sel[f"{alias}_x"], "left"
        ).drop(f"{alias}_x")
        mapped = F.col(f"{alias}_y")
        if required.get(fk_col, True):
            mapped = F.coalesce(mapped, F.lit(0))
        out = out.withColumn(fk_col, mapped.cast("long")).drop(f"{alias}_y")
    return out
