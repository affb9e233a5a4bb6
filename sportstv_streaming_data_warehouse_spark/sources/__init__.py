from .fixtures import FIXTURE_TABLES, load_table, load_all, register_views

__all__ = ["FIXTURE_TABLES", "load_table", "load_all", "register_views"]
