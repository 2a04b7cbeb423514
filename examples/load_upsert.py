"""Upsert/MERGE: initial load, then update-one + insert-one by key.

Spark-first port of the reference example
``/root/reference/examples/load_upsert.py`` (initial overwrite of three
users, then an upsert that updates Bob and inserts David) against the
embedded warehouse.

Run: ``python examples/load_upsert.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging
import tempfile
from datetime import datetime

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


def run_upsert_example(warehouse_path: str | None = None) -> None:
    spark = get_spark("example_load_upsert")
    warehouse_path = warehouse_path or tempfile.mkdtemp(prefix="wh_upsert_")
    wh = Warehouse(warehouse_path)
    identifier = "default.example_upsert_users"
    if wh.table_exists(identifier):
        wh.drop_table(identifier)
        logger.info("Dropped existing table %s", identifier)
    loader = SparkLoader(spark, wh)

    logger.info("--- Initial Load ---")
    now = datetime.now()
    initial = pa.Table.from_pydict(
        {
            "id": [1, 2, 3],
            "name": ["Alice", "Bob", "Charlie"],
            "updated_at": [now, now, now],
        }
    )
    loader.load_data(initial, identifier, LoaderConfig(write_mode="overwrite"))
    rows = wh.load_table(identifier).scan(spark).collect()
    logger.info("Initial rows: %d", len(rows))
    assert len(rows) == 3

    logger.info("--- Upsert (update Bob, insert David) ---")
    later = datetime.now()
    upsert = pa.Table.from_pydict(
        {
            "id": [2, 4],
            "name": ["Bob Updated", "David"],
            "updated_at": [later, later],
        }
    )
    result = loader.load_data(
        upsert, identifier, LoaderConfig(join_cols=("id",))
    )
    assert result["write_mode"] == "upsert"

    after = {
        r.id: r.name
        for r in wh.load_table(identifier).scan(spark).collect()
    }
    logger.info("Rows after upsert: %d -> %s", len(after), after)
    assert after == {
        1: "Alice",
        2: "Bob Updated",
        3: "Charlie",
        4: "David",
    }, after


if __name__ == "__main__":
    run_upsert_example()
    print("OK")
