from .readers import load_table, load_tables, table_names

__all__ = ["load_table", "load_tables", "table_names"]
