"""Why the normalization layer exists: naive inference fails on mixed types.

Spark-first port of
``/root/reference/examples/compare_complex_json_fail.py``: the same
mixed Dict/List column that defeats plain PyArrow schema inference (and
Spark's ``createDataFrame`` inference) loads cleanly through the
engine's messy-JSON normalization path.

Run: ``python examples/compare_complex_json_fail.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def run_comparison(warehouse_path: str | None = None) -> None:
    data = [
        {"id": 1, "complex_field": {"a": 1, "b": "nested"}},
        {"id": 2, "complex_field": {"a": 2, "b": "another", "c": [1, 2]}},
        {"id": 3, "complex_field": [1, 2, 3]},
    ]

    logger.info("--- 1. Standard PyArrow inference (the naive approach) ---")
    try:
        pa.Table.from_pylist(data)
        logger.warning("Unexpected: pa.Table.from_pylist succeeded.")
        naive_failed = False
    except (pa.ArrowInvalid, pa.ArrowTypeError) as e:
        logger.info("As expected, PyArrow inference failed: %s", e)
        naive_failed = True
    assert naive_failed, "mixed Dict/List should defeat naive inference"

    logger.info("--- 2. The engine's normalization path ---")
    spark = get_spark("example_compare_json")
    warehouse_path = warehouse_path or tempfile.mkdtemp(prefix="wh_cmp_")
    wh = Warehouse(warehouse_path)
    identifier = "default.comparison_complex_json"
    if wh.table_exists(identifier):
        wh.drop_table(identifier)
    loader = SparkLoader(spark, wh)
    loader.load_data(
        data,
        identifier,
        LoaderConfig(write_mode="overwrite", schema_evolution=True),
    )
    rows = wh.load_table(identifier).scan(spark).orderBy("id").collect()
    logger.info("Loaded rows: %s", rows)
    assert len(rows) == 3
    assert all(isinstance(r.complex_field, str) for r in rows)
    logger.info("Mixed-type column landed as queryable JSON strings.")


if __name__ == "__main__":
    run_comparison()
    print("OK")
