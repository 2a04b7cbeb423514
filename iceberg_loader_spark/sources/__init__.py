"""Ingest adapters: driver testdata tables, dict/messy-JSON rows, Arrow IPC,
REST endpoints."""

from iceberg_loader_spark.sources.tables import TABLE_NAMES, load_table, register_views

__all__ = ["TABLE_NAMES", "load_table", "register_views"]
