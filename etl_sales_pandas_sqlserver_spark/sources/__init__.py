from .csv_folder import read_csv, read_sales_folder
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
]
