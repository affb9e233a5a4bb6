from .catalog import QUERIES, ORACLE

__all__ = ["QUERIES", "ORACLE"]
