from quasdb_spark.sources.tables import load_table, load_tables, register_temp_views
from quasdb_spark.sources.text_formats import (
    read_csv, read_jsonl, schema_of_table, to_parquet, write_csv,
    write_jsonl)

__all__ = ["load_table", "load_tables", "register_temp_views",
           "read_csv", "read_jsonl", "schema_of_table", "to_parquet",
           "write_csv", "write_jsonl"]
