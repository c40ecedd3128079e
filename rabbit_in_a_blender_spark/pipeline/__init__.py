from .etl import EtlPipeline, TableInputs
from .evolve import diff_schema, evolve, migrate_to_registry, read_evolved
from .stats import analyze_table, suggest_broadcast, table_stats
from .txn import WarehouseTransaction
from .warehouse import SnapshotWarehouse, Warehouse

__all__ = [
    "EtlPipeline",
    "SnapshotWarehouse",
    "TableInputs",
    "Warehouse",
    "WarehouseTransaction",
    "analyze_table",
    "diff_schema",
    "evolve",
    "migrate_to_registry",
    "read_evolved",
    "suggest_broadcast",
    "table_stats",
]
