from .fixtures import FIXTURE_TABLES, load_table, load_all, register_views
from .jdbc import read_jdbc

__all__ = ["FIXTURE_TABLES", "load_table", "load_all", "register_views", "read_jdbc"]
