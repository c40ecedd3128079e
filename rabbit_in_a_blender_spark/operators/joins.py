"""Join operators: the SURVEY §2.C parity surface as DataFrame helpers.

Reference semantics being re-expressed (cited file:line are into
/root/reference/src/riab/etl/bigquery/templates/):

- null-safe multi-key equality (J4): the PK-swap join uses
  ``IFNULL(swap.ci,0)=IFNULL(usagi.conceptId,0)`` so null==null matches
  (etl/{omop_table}_merge.sql.jinja:81-95).  We use ``eqNullSafe`` (<=>),
  NOT coalesce-to-sentinel — a sentinel collides with legitimate 0/''.
- MERGE upsert/delete (J10/J11): CONCEPT_merge.sql.jinja:3-21,
  SOURCE_TO_CONCEPT_MAP_merge.sql.jinja:3-33 — emulated Delta-free as a
  reconcile join + overwrite, which at scale is one shuffle on the merge
  keys (broadcast when the source side is dimension-sized).
- polymorphic event routing (J9): etl/{omop_table}_apply_event_columns
  .sql.jinja:26-153 — discriminator-routed joins re-expressed as one left
  join per candidate table + a CASE coalesce chain.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def null_safe_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    *,
    null_safe_keys: Sequence[str] = (),
) -> DataFrame:
    """Equi-join where ``null_safe_keys`` compare with <=> (null == null).

    Spark compiles eqNullSafe into a regular hash-join key (no fallback to
    nested-loop), so this is as scalable as a plain equi-join.
    """
    cond = None
    for k in keys:
        c = (
            left[k].eqNullSafe(right[k])
            if k in null_safe_keys
            else left[k] == right[k]
        )
        cond = c if cond is None else cond & c
    return left.join(right, cond, how)


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """MERGE: WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT.

    Delta-free emulation: keep target rows that have no source match,
    union all source rows.  Equivalent to the reference's J10 templates
    when the update sets all non-key columns from source (which is what
    CONCEPT_merge / SOURCE_TO_CONCEPT_MAP_merge do).

    Scale: one shuffle on ``keys`` for the anti join; if ``source`` is
    dimension-sized Spark's AQE converts it to broadcast automatically.
    """
    survivors = target.join(source.select(*keys), list(keys), "left_anti")
    return survivors.unionByName(source.select(*target.columns))


def merge_delete(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """MERGE: WHEN MATCHED THEN DELETE (J11) — a left anti join."""
    return target.join(source.select(*keys), list(keys), "left_anti")


def polymorphic_resolve(
    fact: DataFrame,
    discriminator: str,
    value_col: str,
    targets: Mapping[str, tuple[DataFrame, str, str]],
    out_col: str = "resolved_id",
    default: Column | None = None,
) -> DataFrame:
    """Resolve a polymorphic reference column (J9).

    ``targets`` maps a discriminator value -> (dim_df, dim_key, dim_out):
    when ``fact[discriminator] == value`` the output is the matched
    ``dim_out`` from joining ``fact[value_col] == dim_df[dim_key]``.
    Rows whose discriminator matches no entry get ``default`` (else 0).

    Mirrors apply_event_columns: one LEFT JOIN per candidate table plus a
    CASE chain over the discriminator.  Broadcast-vs-shuffle per dim is
    AQE's call: event targets range from true dimensions (provider) to
    fact-sized swaps (visit_occurrence at scale) — runtime size stats
    pick broadcast for the small ones and SMJ with only matching
    discriminator rows for the big ones (the ``disc == value`` conjunct
    prunes the probe side).  The caller should prune ``targets`` to
    discriminator values actually present (the reference discovers them
    first — U2 get_event_tables).
    """
    out = fact
    resolved: Column | None = None
    for i, (disc_value, (dim, dim_key, dim_out)) in enumerate(targets.items()):
        alias = f"__poly_{i}"
        dim_sel = dim.select(
            F.col(dim_key).alias(f"{alias}_k"), F.col(dim_out).alias(f"{alias}_v")
        )
        out = out.join(
            dim_sel,
            (out[discriminator] == F.lit(disc_value))
            & (out[value_col] == dim_sel[f"{alias}_k"]),
            "left",
        ).drop(f"{alias}_k")
        branch = F.when(
            F.col(discriminator) == F.lit(disc_value), F.col(f"{alias}_v")
        )
        resolved = branch if resolved is None else resolved.when(
            F.col(discriminator) == F.lit(disc_value), F.col(f"{alias}_v")
        )
    default = default if default is not None else F.lit(0)
    out = out.withColumn(
        out_col,
        F.coalesce(resolved, default) if resolved is not None else default,
    )
    return out.drop(*[f"__poly_{i}_v" for i in range(len(targets))])
