from .warehouse import Warehouse
from .etl import EtlPipeline, TableInputs

__all__ = ["Warehouse", "EtlPipeline", "TableInputs"]
