from .readers import TESTDATA_TABLES, load_table, load_tables, read_transactions_csv
from .sinks import write_json_metrics, write_single_csv

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "load_tables",
    "read_transactions_csv",
    "write_json_metrics",
    "write_single_csv",
]
