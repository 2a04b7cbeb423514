"""Changelog reads (CDC) + clustering rewrites.

Demonstrates the table-layer features a downstream consumer leans on:

* the one-call convenience loaders (``load_data_to_table``),
* ``Table.changes`` — row-level insert/delete changelog across
  append/delete/merge commits,
* ``rewrite_data_files(sort_by=...)`` and ``(zorder_by=...)`` — linear
  vs multi-dimensional clustering, with the per-file stats that drive
  metadata pruning printed for both.

Run: ``python examples/cdc_and_clustering.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging
import tempfile

from iceberg_loader_spark import (
    LoaderConfig,
    Warehouse,
    get_spark,
    load_data_to_table,
)
from iceberg_loader_spark.tables.maintenance import rewrite_data_files

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
)
logger = logging.getLogger(__name__)


def main(warehouse_path: str | None = None) -> dict:
    spark = get_spark("example_cdc")
    warehouse_path = warehouse_path or tempfile.mkdtemp(prefix="wh_cdc_")
    wh = Warehouse(warehouse_path)
    tid = "db.accounts"

    # 1. one-call ingest via the module-level API
    load_data_to_table(
        [{"id": i, "region": i % 4, "balance": 100 + i} for i in range(8)],
        tid,
        spark,
        wh,
        LoaderConfig(load_timestamp=False),
    )
    t = wh.load_table(tid)
    base = t.meta.current_version()
    logger.info("base version %d, %d rows", base, t.scan(spark).count())

    # 2. mutate: delete one account, upsert two (one update + one insert)
    t.delete_where(spark, "id == 0")
    t = wh.load_table(tid)
    src = spark.createDataFrame(
        [(1, 1, 999), (100, 0, 1)], t.schema()
    )
    t.merge(spark, src, ["id"])
    t = wh.load_table(tid)

    # 3. read the changelog since the base snapshot
    changes = t.changes(spark, base).orderBy(
        "_commit_version", "_change_type", "id"
    )
    rows = [r.asDict() for r in changes.collect()]
    for r in rows:
        logger.info(
            "v%d %-6s id=%s balance=%s",
            r["_commit_version"],
            r["_change_type"],
            r["id"],
            r["balance"],
        )
    n_deletes = sum(1 for r in rows if r["_change_type"] == "delete")
    n_inserts = sum(1 for r in rows if r["_change_type"] == "insert")
    assert n_deletes == 2, rows  # delete_where + merge's old row
    assert n_inserts == 2, rows  # merge's new row value + pure insert

    # 4. clustering rewrites: z-order on (region, balance) so point
    # predicates on EITHER column prune files
    rewrite_data_files(t, spark, zorder_by=["region", "balance"], target_files=4)
    t = wh.load_table(tid)
    for f in t.snapshot().files:
        logger.info(
            "file %s region=%s balance=%s",
            f.path.rsplit("/", 1)[-1],
            f.stats.get("region"),
            f.stats.get("balance"),
        )
    assert t.scan(spark).count() == 8  # 8 - 1 deleted + 1 inserted

    logger.info("OK")
    return {"changes": len(rows), "files": len(t.snapshot().files)}


if __name__ == "__main__":
    main()
