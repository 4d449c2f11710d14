from bighouse_spark.sources.catalog import TABLES, load_table, load_tables, register_views
from bighouse_spark.sources.readers import read_source, with_file_column

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_source",
    "with_file_column",
]
