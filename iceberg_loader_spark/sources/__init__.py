"""Ingest adapters: driver testdata tables, dict/messy-JSON rows, Arrow IPC,
REST endpoints — plus the `sparkberg` Spark Python Data Source exposing
the table format through `spark.read.format("sparkberg")`."""

from iceberg_loader_spark.sources.spark_datasource import (
    SparkbergDataSource,
    register as register_data_source,
)
from iceberg_loader_spark.sources.tables import TABLE_NAMES, load_table, register_views

__all__ = [
    "TABLE_NAMES",
    "SparkbergDataSource",
    "load_table",
    "register_data_source",
    "register_views",
]
