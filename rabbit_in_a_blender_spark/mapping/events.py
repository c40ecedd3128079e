"""Stage-2 polymorphic event resolution (SURVEY §3.1 step 5, §2.C J9).

Six OMOP tables carry ``*_event_id`` columns that may reference ANY
table, discriminated by an ``*_field_concept_id`` column
(etl/cdm_5.4_events.json).  After all tables are built, stage 2:

1. discover which target tables are actually referenced (U2 —
   bq:etl/{omop_table}_get_event_tables.sql.jinja:3-12);
2. join the event value against each referenced table's PK swap, routed
   by the discriminator (J9 — apply_event_columns.sql.jinja:26-153);
3. rebuild the table (work → omop).

Pruning step 1 first matters at scale: the CASE chain only grows joins
for tables that appear, exactly like the reference discovers-then-renders.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import polymorphic_resolve


def discover_event_tables(
    df: DataFrame, event_cols: Mapping[str, str]
) -> dict[str, list[str]]:
    """Distinct discriminator values per event column (drives join pruning).

    One aggregation pass over the union of discriminator columns instead
    of a scan per column.
    """
    pairs = [
        df.filter(F.col(v).isNotNull() & F.col(e).isNotNull())
        .select(F.lit(e).alias("event_col"), F.col(v).alias("target"))
        for e, v in event_cols.items()
    ]
    if not pairs:
        return {}
    unioned = pairs[0]
    for p in pairs[1:]:
        unioned = unioned.unionByName(p)
    rows = unioned.distinct().collect()  # discriminator domain: tiny metadata
    out: dict[str, list[str]] = {e: [] for e in event_cols}
    for r in rows:
        out[r["event_col"]].append(r["target"])
    return {e: sorted(v) for e, v in out.items()}


def resolve_event_columns(
    df: DataFrame,
    event_cols: Mapping[str, str],
    swap_lookup: Callable[[str], DataFrame | None],
    key_col: str = "x",
    id_col: str = "y",
) -> DataFrame:
    """Replace each event column's prequel value by the target table's
    swapped PK, routed by its discriminator column; unresolvable → 0."""
    discovered = discover_event_tables(df, event_cols)
    out = df
    for event_col, disc_col in event_cols.items():
        targets = {}
        for table in discovered.get(event_col, []):
            swap = swap_lookup(table)
            if swap is not None:
                targets[table] = (swap, key_col, id_col)
        if targets:
            out = polymorphic_resolve(
                out,
                discriminator=disc_col,
                value_col=event_col,
                targets=targets,
                out_col=f"__res_{event_col}",
            )
            out = out.withColumn(
                event_col, F.col(f"__res_{event_col}").cast("long")
            ).drop(f"__res_{event_col}")
        else:
            out = out.withColumn(event_col, F.lit(0).cast("long"))
    return out
