"""Structured Streaming operators (SURVEY.md §2 B20–B23).

``windows.py`` declares tumbling/sliding/session window semantics that run
identically in batch (oracle-checked) and micro-batch streaming
(watermarked runners, exercised by ``tests/test_streaming_struct.py``).
"""

from iceberg_loader_spark.streaming.sink import FanOutSink, IdempotentTableSink
from iceberg_loader_spark.streaming.source import TableTailReader
from iceberg_loader_spark.streaming.windows import ORACLES, QUERIES

__all__ = [
    "QUERIES",
    "ORACLES",
    "FanOutSink",
    "IdempotentTableSink",
    "TableTailReader",
]
