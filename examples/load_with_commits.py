"""Commit-interval batching: 20 batches, one snapshot per 5 batches.

Spark-first port of the reference example
``/root/reference/examples/load_with_commits.py`` (20 batches at
commit_interval=5 → 4 commits, 2000 rows) against the embedded warehouse
instead of a Hive/MinIO catalog.

Run: ``python examples/load_with_commits.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging
import tempfile
import time

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


def generate_batches(num_batches: int = 20, batch_size: int = 100):
    for i in range(num_batches):
        yield pa.RecordBatch.from_pydict(
            {
                "id": list(range(i * batch_size, (i + 1) * batch_size)),
                "batch_id": [i] * batch_size,
                "ts": [time.time()] * batch_size,
            }
        )


def run_example(warehouse_path: str | None = None) -> dict:
    spark = get_spark("example_load_with_commits")
    warehouse_path = warehouse_path or tempfile.mkdtemp(prefix="wh_commits_")
    wh = Warehouse(warehouse_path)
    identifier = "default.commit_interval_test"
    if wh.table_exists(identifier):
        wh.drop_table(identifier)
        logger.info("Dropped old table %s", identifier)

    logger.info("Starting load with commit_interval=5...")
    config = LoaderConfig(write_mode="append", commit_interval=5)
    loader = SparkLoader(spark, wh)
    result = loader.load_data_batches(
        generate_batches(num_batches=20, batch_size=100), identifier, config
    )
    logger.info("Load complete. Result: %s", result)

    table = wh.load_table(identifier)
    snapshots = table.history()
    data_commits = [s for s in snapshots if s.operation == "append"]
    logger.info("Table has %d data commits (snapshots)", len(data_commits))
    for i, snap in enumerate(data_commits):
        logger.info(
            "Snapshot %d: ID=%s, Timestamp=%s",
            i + 1,
            snap.snapshot_id,
            snap.timestamp_ms,
        )
    # 20 batches / commit_interval 5 → 4 data commits
    assert len(data_commits) == 4, f"expected 4 commits, got {len(data_commits)}"

    total_rows = table.scan(spark).count()
    logger.info("Total rows in table: %d", total_rows)
    assert total_rows == 2000, f"Expected 2000 rows, got {total_rows}"
    return result


if __name__ == "__main__":
    run_example()
    print("OK")
