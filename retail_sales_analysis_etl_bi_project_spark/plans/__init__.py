from .registry import QUERIES, ORACLES, query

__all__ = ["QUERIES", "ORACLES", "query"]
