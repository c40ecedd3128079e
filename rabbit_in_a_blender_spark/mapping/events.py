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

# Table-name → CDM-vocabulary field concept id, mirrored from the
# reference's literal CASE (bq:etl/{omop_table}_apply_event_columns
# .sql.jinja:44-141).  Stage 2 replaces the table-name string the user's
# queries put in the discriminator column with this concept id.  The
# reference's own "cost" WHEN has an empty literal (an upstream template
# bug — it would not render runnable SQL), so cost is deliberately
# absent here and falls through to the ELSE 0 like any unknown value.
EVENT_TYPE_CONCEPT_IDS: dict[str, int] = {
    "care_site": 1147195,
    "cohort_definition": 1147004,
    "concept": 1146945,
    "concept_class": 1146963,
    "condition_era": 1147295,
    "condition_occurrence": 1147127,
    "death": 1147064,
    "device_exposure": 1147115,
    "domain": 1146960,
    "dose_era": 1147288,
    "drug_era": 1147281,
    "drug_exposure": 1147094,
    "episode": 756290,
    "location": 1147187,
    "measurement": 1147138,
    "metadata": 756314,
    "note": 1147156,
    "note_nlp": 1147589,
    "observation": 1147165,
    "observation_period": 1147044,
    "payer_plan_period": 1147214,
    "person": 1147026,
    "procedure_occurrence": 1147082,
    "provider": 1147201,
    "relationship": 1146972,
    "specimen": 1147049,
    "visit_detail": 1147624,
    "visit_occurrence": 1147070,
    "vocabulary": 1146955,
}


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
    rewrite_discriminator: bool = True,
) -> DataFrame:
    """Replace each event column's prequel value by the target table's
    swapped PK, routed by its discriminator column; unresolvable → 0.

    With ``rewrite_discriminator`` the table-name string in the
    discriminator column is then replaced by its CDM field concept id
    (ELSE 0), matching the reference's second CASE in
    apply_event_columns.sql.jinja:68-141."""
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
        if rewrite_discriminator:
            mapped = None
            for table in sorted(targets):
                cid = EVENT_TYPE_CONCEPT_IDS.get(table)
                if cid is None:
                    continue
                branch = F.when(F.col(disc_col) == F.lit(table), F.lit(cid))
                mapped = branch if mapped is None else mapped.when(
                    F.col(disc_col) == F.lit(table), F.lit(cid)
                )
            mapped = (
                F.coalesce(mapped, F.lit(0)) if mapped is not None else F.lit(0)
            )
            out = out.withColumn(disc_col, mapped.cast("long"))
    return out
