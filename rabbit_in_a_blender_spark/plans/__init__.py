from .catalog import CatalogQuery, register, all_queries, all_oracles, get

__all__ = ["CatalogQuery", "register", "all_queries", "all_oracles", "get"]
