from pyspark_data_engineering_assignment_spark.sources.readers import (
    read_csv,
    read_csv_stream,
    read_parquet,
    read_transactions,
    read_importance,
)
from pyspark_data_engineering_assignment_spark.sources.tables import TABLES, load_table, load_tables

__all__ = [
    "read_csv",
    "read_csv_stream",
    "read_parquet",
    "read_transactions",
    "read_importance",
    "TABLES",
    "load_table",
    "load_tables",
]
