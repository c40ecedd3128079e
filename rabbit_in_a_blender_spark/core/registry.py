"""Metadata-driven schema registry (SURVEY §1.1).

The reference derives every table/column/PK/FK/required behavior from the
OHDSI CDM metadata CSVs at startup (etl/etl_base.py:55-142) and generates
per-column SQL from it.  Here the same metadata drives DataFrame
transform generation: a ``TableSpec`` per table, a registry with the
FK-dependency toposort (etl/etl_base.py:155-218).

Only five primitive types exist in the reference model (§1.2):
int64, float64, string, date, datetime → Spark long/double/string/
date/timestamp_ntz (+ our extension arrays).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

_TYPE_MAP = {
    "integer": T.LongType(),
    "int64": T.LongType(),
    "float": T.DoubleType(),
    "float64": T.DoubleType(),
    "string": T.StringType(),
    "varchar": T.StringType(),
    "date": T.DateType(),
    "datetime": T.TimestampNTZType(),
}


def spark_type(cdm_type: str) -> T.DataType:
    """CDM datatype string → Spark type (varchar(50) etc. → string)."""
    key = cdm_type.lower().split("(")[0]
    return _TYPE_MAP[key]


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    dtype: str = "string"  # CDM-style type name, see _TYPE_MAP
    required: bool = False


@dataclass
class TableSpec:
    """One CDM-style table: PK, FK routing, concept columns, event columns.

    ``fks`` maps fk column -> parent table name; special-routing cases
    (preceding_visit_occurrence_id → visit_occurrence, etc. — reference
    etl/{omop_table}_merge.sql.jinja:96-112) are expressed simply by
    pointing the column at its parent here.
    ``event_cols`` maps a polymorphic event column -> its discriminator
    column (the *_field_concept_id twin, cdm_5.4_events.json).
    ``cluster_by`` is the BigQuery CLUSTER BY analog (bq:ddl/
    OMOPCDM_bigquery_5.4_clustering_fields.json): final table writes
    range-partition + sort on these keys so parquet rowgroup min/max
    stats prune selective reads the way clustered tables do.
    """

    name: str
    columns: list[ColumnSpec]
    pk: str | None = None
    fks: dict[str, str] = field(default_factory=dict)
    concept_cols: list[str] = field(default_factory=list)
    event_cols: dict[str, str] = field(default_factory=dict)
    cluster_by: list[str] = field(default_factory=list)

    def schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(c.name, spark_type(c.dtype), nullable=not c.required)
                for c in self.columns
            ]
        )

    def required_cols(self) -> list[str]:
        return [c.name for c in self.columns if c.required]


class SchemaRegistry:
    def __init__(self, tables: list[TableSpec]):
        self.tables = {t.name: t for t in tables}

    def __getitem__(self, name: str) -> TableSpec:
        return self.tables[name]

    def __contains__(self, name: str) -> bool:
        return name in self.tables

    def dependency_levels(self) -> list[list[str]]:
        """FK-DAG toposort into parallel execution levels
        (reference etl/etl_base.py:155-218).  Self-FKs are ignored
        (EPISODE self-reference fixup, etl_base.py:107-132)."""
        deps = {
            name: {p for p in spec.fks.values() if p != name and p in self.tables}
            for name, spec in self.tables.items()
        }
        levels: list[list[str]] = []
        remaining = dict(deps)
        while remaining:
            ready = sorted(n for n, d in remaining.items() if not d)
            if not ready:
                raise ValueError(f"FK cycle among: {sorted(remaining)}")
            levels.append(ready)
            for n in ready:
                del remaining[n]
            for d in remaining.values():
                d.difference_update(ready)
        return levels
