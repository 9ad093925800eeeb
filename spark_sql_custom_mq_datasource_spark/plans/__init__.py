from .registry import QUERIES, Query, get_queries, get_oracles, register

__all__ = ["QUERIES", "Query", "get_queries", "get_oracles", "register"]
