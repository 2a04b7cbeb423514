"""Messy-JSON normalization: nested dicts/lists become JSON strings.

Spark-first port of ``/root/reference/examples/load_complex_json.py``:
heterogeneous nested values in a column are serialized to JSON text at
the normalization layer, so the table column is a plain queryable string
(`get_json_object` / `json_tuple` reach inside it afterwards).

Run: ``python examples/load_complex_json.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import logging
import tempfile

from iceberg_loader_spark import get_spark
from iceberg_loader_spark.config import LoaderConfig
from iceberg_loader_spark.loader import SparkLoader
from iceberg_loader_spark.tables import Warehouse

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
)
logger = logging.getLogger(__name__)


def run_complex_load(warehouse_path: str | None = None) -> None:
    spark = get_spark("example_complex_json")
    warehouse_path = warehouse_path or tempfile.mkdtemp(prefix="wh_json_")
    wh = Warehouse(warehouse_path)
    identifier = "default.complex_json_test"
    if wh.table_exists(identifier):
        wh.drop_table(identifier)
        logger.info("Dropped existing table %s", identifier)

    data = [
        {"id": 1, "complex_field": {"a": 1, "b": "nested"}},
        {"id": 2, "complex_field": {"a": 2, "b": "another", "c": [1, 2]}},
        {"id": 3, "complex_field": [1, 2, 3]},
    ]
    logger.info("Original Data:")
    for row in data:
        logger.info(row)

    loader = SparkLoader(spark, wh)
    loader.load_data(
        data,
        identifier,
        LoaderConfig(write_mode="append", schema_evolution=True),
    )

    logger.info("Verifying data...")
    rows = wh.load_table(identifier).scan(spark).orderBy("id").collect()
    assert len(rows) == len(data), (len(rows), len(data))
    for row in rows:
        val = row.complex_field
        assert isinstance(val, str), f"complex_field is not a string: {type(val)}"
        parsed = json.loads(val)
        logger.info("Row %s: complex_field is STRING; parsed: %s", row.id, parsed)
    # the JSON column is queryable in place
    n_nested = (
        wh.load_table(identifier)
        .scan(spark)
        .selectExpr("get_json_object(complex_field, '$.b') AS b")
        .filter("b IS NOT NULL")
        .count()
    )
    assert n_nested == 2, n_nested
    logger.info("get_json_object reached %d nested values", n_nested)


if __name__ == "__main__":
    run_complex_load()
    print("OK")
