from .csv_folder import read_csv, read_sales_folder
from .formats import (
    read_jsonl,
    read_partitioned_parquet,
    write_jsonl,
    write_partitioned_parquet,
)
from .testdata import load_table, load_testdata
from .sinks import write_single_csv, jdbc_url, write_jdbc

__all__ = [
    "read_csv",
    "read_sales_folder",
    "load_table",
    "load_testdata",
    "write_single_csv",
    "jdbc_url",
    "write_jdbc",
    "read_jsonl",
    "write_jsonl",
    "read_partitioned_parquet",
    "write_partitioned_parquet",
]
