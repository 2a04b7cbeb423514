"""iceberg_loader_spark — a PySpark-native analytics + lakehouse-ingest engine.

A from-scratch Spark re-expression of the capabilities of
vndvtech/iceberg-loader (see SURVEY.md), plus the Spark-native query surface
and LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Layout:
    session      SparkSession factory (semantics-parity confs)
    config       LoaderConfig (frozen dataclass + validation)
    tables/      snapshot-versioned parquet table layer ("icepack"):
                 atomic metadata commits, write strategies, time travel,
                 partition transforms, expiry, compaction
    loader       high-level load_data / load_batches / IPC-stream entry points
    operators/   Part B query surface (relational, dedup, similarity, text,
                 multimodal)
    streaming/   Structured Streaming ops (windows, watermark, stateful dedup)
    sources/     ingest adapters (dicts/messy-JSON, Arrow IPC, REST)
"""

from iceberg_loader_spark.config import LoaderConfig
from iceberg_loader_spark.loader import (
    SparkLoader,
    load_batches_to_table,
    load_data_to_table,
    load_ipc_stream_to_table,
)
from iceberg_loader_spark.quality import Check
from iceberg_loader_spark.session import get_spark
from iceberg_loader_spark.sources import SparkbergDataSource, register_data_source
from iceberg_loader_spark.tables import Warehouse

__version__ = "0.1.0"

__all__ = [
    "Check",
    "LoaderConfig",
    "SparkLoader",
    "SparkbergDataSource",
    "Warehouse",
    "get_spark",
    "load_batches_to_table",
    "load_data_to_table",
    "load_ipc_stream_to_table",
    "register_data_source",
    "__version__",
]
