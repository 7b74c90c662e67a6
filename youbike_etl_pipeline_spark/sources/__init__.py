"""Sources & sinks — schema-first readers and idempotent writers."""

from .readers import load_tables, read_csv_tolerant, read_json_records, read_parquet_table
from .writers import append_dedup, upsert_insert_if_absent, write_csv, write_parquet

__all__ = [
    "load_tables",
    "read_csv_tolerant",
    "read_json_records",
    "read_parquet_table",
    "append_dedup",
    "upsert_insert_if_absent",
    "write_csv",
    "write_parquet",
]
