"""Arrow IPC stream load with commit-interval batching.

Spark-first port of the reference stress example
``/root/reference/examples/load_stream.py`` (an IPC byte stream fed
straight into the loader, one snapshot per 5 batches). Size is scaled
down for a quick example run; pass ``target_mb`` to stress it.

Run: ``python examples/load_stream.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import io
import logging
import tempfile

import pyarrow as pa

from iceberg_loader_spark import get_spark
from iceberg_loader_spark.config import LoaderConfig
from iceberg_loader_spark.loader import SparkLoader
from iceberg_loader_spark.tables import Warehouse

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
)
logger = logging.getLogger(__name__)


def run_stream_load(
    warehouse_path: str | None = None,
    target_mb: int = 8,
    batch_rows: int = 20_000,
) -> dict:
    spark = get_spark("example_load_stream")
    warehouse_path = warehouse_path or tempfile.mkdtemp(prefix="wh_stream_")
    wh = Warehouse(warehouse_path)
    identifier = "default.stream_test"
    if wh.table_exists(identifier):
        wh.drop_table(identifier)
        logger.info("Dropped existing table %s", identifier)

    logger.info("Generating IPC stream...")
    sink = io.BytesIO()
    schema = pa.schema(
        [pa.field("id", pa.int64()), pa.field("value", pa.string())]
    )
    target_bytes = target_mb * 1024 * 1024
    written_batches = 0
    with pa.ipc.new_stream(sink, schema) as writer:
        while sink.getbuffer().nbytes < target_bytes:
            base = written_batches * batch_rows
            writer.write_batch(
                pa.RecordBatch.from_pydict(
                    {
                        "id": list(range(base, base + batch_rows)),
                        "value": [
                            f"val_{written_batches}_{j}" for j in range(batch_rows)
                        ],
                    },
                    schema=schema,
                )
            )
            written_batches += 1
    sink.seek(0)
    logger.info(
        "Final stream size: %.1f MB (%s batches)",
        sink.getbuffer().nbytes / (1024 * 1024),
        written_batches,
    )

    loader = SparkLoader(spark, wh)
    result = loader.load_ipc_stream(
        sink,
        identifier,
        LoaderConfig(write_mode="append", commit_interval=5),
    )
    logger.info("Load result: %s", result)

    expected = written_batches * batch_rows
    table = wh.load_table(identifier)
    count = table.scan(spark).count()
    logger.info("Verified rows in table: %s (expected: %s)", count, expected)
    assert count == expected, (count, expected)
    assert result["rows_loaded"] == expected
    return result


if __name__ == "__main__":
    run_stream_load()
    print("OK")
