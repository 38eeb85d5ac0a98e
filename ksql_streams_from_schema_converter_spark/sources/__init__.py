from .parquet import TABLE_NAMES, load_table, load_tables, register_views  # noqa: F401
