from .etl import EtlPipeline, TableInputs
from .evolve import diff_schema, evolve, migrate_to_registry, read_evolved
from .txn import WarehouseTransaction
from .warehouse import SnapshotWarehouse, Warehouse

__all__ = [
    "EtlPipeline",
    "SnapshotWarehouse",
    "TableInputs",
    "Warehouse",
    "WarehouseTransaction",
    "diff_schema",
    "evolve",
    "migrate_to_registry",
    "read_evolved",
]
