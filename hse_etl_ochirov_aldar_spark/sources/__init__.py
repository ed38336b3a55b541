from .readers import TABLES, load_table, load_tables, read_csv_all_string

__all__ = ["TABLES", "load_table", "load_tables", "read_csv_all_string"]
