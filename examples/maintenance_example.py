"""Snapshot maintenance: expiry, compaction, orphan-file cleanup.

Spark-first port of ``/root/reference/examples/maintenance_example.py``,
extended with the two procedures that pair with expiry at scale:
``rewrite_data_files`` (compaction) and ``remove_orphan_files``.

Run: ``python examples/maintenance_example.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging
import tempfile

from iceberg_loader_spark import get_spark
from iceberg_loader_spark.config import LoaderConfig
from iceberg_loader_spark.loader import SparkLoader
from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables.maintenance import (
    expire_snapshots,
    remove_orphan_files,
    rewrite_data_files,
)

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
)
logger = logging.getLogger(__name__)


def main(warehouse_path: str | None = None) -> dict:
    spark = get_spark("example_maintenance")
    warehouse_path = warehouse_path or tempfile.mkdtemp(prefix="wh_maint_")
    wh = Warehouse(warehouse_path)
    identifier = "default.maintenance_demo"
    loader = SparkLoader(spark, wh)
    cfg = LoaderConfig(load_timestamp=False)
    # ten tiny appends -> ten snapshots, ten small files
    for i in range(10):
        loader.load_data([{"id": i, "v": i * 10}], identifier, cfg)

    table = wh.load_table(identifier)
    logger.info(
        "Before: %d snapshots, %d files",
        len(table.history()),
        len(table.snapshot().files),
    )

    compact = rewrite_data_files(table, spark)
    logger.info("Compaction: %s", compact)
    table = wh.load_table(identifier)

    expired = expire_snapshots(table, keep_last=2)
    logger.info("Expiry: %s", expired)

    orphans = remove_orphan_files(table)
    logger.info("Orphan cleanup: %s", orphans)

    table = wh.load_table(identifier)
    n_rows = table.scan(spark).count()
    logger.info(
        "After: %d snapshots, %d files, %d rows",
        len(table.history()),
        len(table.snapshot().files),
        n_rows,
    )
    assert n_rows == 10
    assert len(table.history()) == 2
    return {"compact": compact, "expired": expired, "orphans": orphans}


if __name__ == "__main__":
    main()
    print("OK")
