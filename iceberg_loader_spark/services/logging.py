"""Structured logging + metrics service (SURVEY.md §2 A36).

Behavior parity with the reference's logging service
(/root/reference src/iceberg_loader/services/logging.py:61-159): one
engine-scoped logger, selectable TEXT or JSON formatter, a ``metrics``
hook that emits counters as INFO records carrying an ``extra`` mapping,
and a ``suppress_and_warn`` context manager used by maintenance paths.

Re-expressed plainly (no module-level ``__getattr__`` indirection): call
:func:`get_logger` / :func:`configure_logging` and log on the returned
logger. On a Spark cluster this logger lives on the driver; executor-side
code should not log through it (executor logs flow through log4j).
"""

from __future__ import annotations

import contextlib
import json
import logging
import sys
from collections.abc import Iterator, Mapping
from typing import Any

_LOGGER_NAME = "iceberg_loader_spark"
_LOGGER: logging.Logger | None = None


class TextFormatter(logging.Formatter):
    """``time [LEVEL] name: message`` text lines."""

    def __init__(self, **kwargs: Any):
        kwargs.setdefault("fmt", "{asctime} [{levelname}] {name}: {message}")
        kwargs.setdefault("style", "{")
        super().__init__(**kwargs)


class JsonFormatter(logging.Formatter):
    """One JSON object per record; metrics ride in a ``metrics`` key."""

    def __init__(
        self,
        component: str = "iceberg-loader-spark",
        version: Mapping[str, str] | None = None,
        **kwargs: Any,
    ):
        super().__init__(**kwargs)
        self.component = component
        self.version = dict(version) if version else None

    def format(self, record: logging.LogRecord) -> str:
        obj: dict[str, Any] = {
            "time": self.formatTime(record, self.datefmt),
            "level": record.levelname,
            "message": record.getMessage(),
            "logger": record.name,
            "component": self.component,
            "module": record.module,
            "line": record.lineno,
        }
        if record.exc_info:
            obj["exception"] = self.formatException(record.exc_info)
        metrics_payload = getattr(record, "metrics", None)
        if metrics_payload is not None:
            obj["metrics"] = metrics_payload
        if self.version:
            obj["version"] = self.version
        return json.dumps(obj)


def configure_logging(
    level: str = "INFO",
    log_format: str = "TEXT",
    component: str = "iceberg-loader-spark",
    version: Mapping[str, str] | None = None,
    stream: Any = None,
) -> logging.Logger:
    """(Re)initialize the engine logger. ``log_format``: TEXT or JSON."""
    global _LOGGER
    logger = logging.getLogger(_LOGGER_NAME)
    logger.setLevel(level.upper())
    logger.handlers.clear()
    handler = logging.StreamHandler(stream if stream is not None else sys.stderr)
    if log_format.upper() == "JSON":
        handler.setFormatter(JsonFormatter(component=component, version=version))
    else:
        handler.setFormatter(TextFormatter())
    logger.addHandler(handler)
    logger.propagate = False
    _LOGGER = logger
    return logger


def get_logger() -> logging.Logger:
    """The configured engine logger (configuring defaults on first use)."""
    return _LOGGER if _LOGGER is not None else configure_logging()


def metrics(name: str, extra: Mapping[str, Any]) -> None:
    """Emit a metric event: INFO record named ``METRIC: <name>`` with the
    measurement mapping attached (surfaces as ``metrics`` in JSON logs)."""
    get_logger().info("METRIC: %s", name, extra={"metrics": dict(extra)})


@contextlib.contextmanager
def suppress_and_warn(msg: str) -> Iterator[None]:
    """Swallow any exception from the block, logging it as a warning —
    the error policy of maintenance operations (expiry must never fail a
    load)."""
    try:
        yield
    except Exception:
        get_logger().warning(msg, exc_info=True)
