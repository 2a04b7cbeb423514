"""Operational services: structured logging + metrics (SURVEY.md §2 A36)."""

from iceberg_loader_spark.services.logging import (
    JsonFormatter,
    TextFormatter,
    configure_logging,
    get_logger,
    metrics,
    suppress_and_warn,
)

__all__ = [
    "JsonFormatter",
    "TextFormatter",
    "configure_logging",
    "get_logger",
    "metrics",
    "suppress_and_warn",
]
