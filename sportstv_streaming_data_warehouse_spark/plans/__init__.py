from .catalog import QUERIES, ORACLE
from . import bucketing, cdc, hypertable, layout, quality, scd, star, warehouse

__all__ = [
    "QUERIES",
    "ORACLE",
    "bucketing",
    "cdc",
    "hypertable",
    "layout",
    "quality",
    "scd",
    "star",
    "warehouse",
]
