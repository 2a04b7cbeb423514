"""Snapshot maintenance: the full six-procedure lifecycle.

Spark-first port of ``/root/reference/examples/maintenance_example.py``,
extended with every procedure that pairs with expiry at scale:
``rewrite_data_files`` (compaction), ``remove_orphan_files``,
``rewrite_manifests`` (metadata-chain squash), and the delete
CONVERGENCE pair — ``convert_equality_deletes`` (materialize equality
deletes into positions) followed by ``rewrite_delete_files`` (merge all
position-delete files to target-sized shards) — which together stop a
delete-heavy merge-on-read table's scan cost from growing with delete
count.

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
    convert_equality_deletes,
    expire_snapshots,
    remove_orphan_files,
    rewrite_data_files,
    rewrite_delete_files,
    rewrite_manifests,
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

    # merge-on-read deletes: a positional delete (row-exact) and an
    # equality delete (key-exact) — each commits a delete FILE, and
    # every scan pays one anti-join per applicable file until the
    # convergence procedures below run
    table.delete_where(spark, "v >= 80", mode="mor-pos")
    table = wh.load_table(identifier)
    table.delete_by_keys(
        spark, spark.createDataFrame([(3,)], "id bigint"), ["id"]
    )
    table = wh.load_table(identifier)
    logger.info(
        "Delete files before convergence: %d",
        len(table.snapshot().delete_files),
    )

    squash = rewrite_manifests(table)
    logger.info("Manifest squash: %s", squash)
    table = wh.load_table(identifier)

    converted = convert_equality_deletes(table, spark)
    logger.info("Equality-delete conversion: %s", converted)
    table = wh.load_table(identifier)

    merged = rewrite_delete_files(table, spark)
    logger.info("Position-delete merge: %s", merged)
    table = wh.load_table(identifier)
    assert all(
        d.get("kind") == "pos" for d in table.snapshot().delete_files
    )
    assert len(table.snapshot().delete_files) <= 1

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
    # rows 8, 9 (v >= 80) and id 3 are deleted; content survives every
    # metadata procedure unchanged
    assert n_rows == 7
    assert len(table.history()) == 2
    return {
        "compact": compact,
        "expired": expired,
        "orphans": orphans,
        "squash": squash,
        "converted": converted,
        "merged": merged,
    }


if __name__ == "__main__":
    main()
    print("OK")
