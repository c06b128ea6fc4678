"""Sources and sinks: schema-checked readers and partition-aware writers."""

from financial_data_pipeline_optimization_spark.sources.readers import (
    load_table,
    load_tables,
    read_csv,
    read_jdbc,
    read_parquet,
)
from financial_data_pipeline_optimization_spark.sources.sinks import (
    write_csv,
    write_jdbc,
    write_parquet,
)

__all__ = [
    "load_table",
    "load_tables",
    "read_csv",
    "read_jdbc",
    "read_parquet",
    "write_csv",
    "write_jdbc",
    "write_parquet",
]
