from .session import get_spark, stop_spark
from .io import load_tables, register_views, TPCH_TABLES

__all__ = ["get_spark", "stop_spark", "load_tables", "register_views", "TPCH_TABLES"]
