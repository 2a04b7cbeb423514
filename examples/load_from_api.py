"""REST API → table ingestion with per-endpoint write strategies.

Spark-first port of ``/root/reference/examples/load_from_api.py``: each
endpoint maps to its own write strategy (overwrite for reference data,
upsert-by-key for orders, append for events). The HTTP transport is
injectable; this example runs against a canned in-process transport so it
needs no network — swap ``transport=`` out for the real API.

Run: ``python examples/load_from_api.py``
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
from iceberg_loader_spark.sources.rest import RestSource
from iceberg_loader_spark.tables import Warehouse

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
)
logger = logging.getLogger(__name__)

_CANNED = {
    "customers": [
        {"id": 1, "name": "Alice", "tier": "gold"},
        {"id": 2, "name": "Bob", "tier": "silver"},
    ],
    "orders": [
        {"id": 10, "customer_id": 1, "total": 99.5},
        {"id": 11, "customer_id": 2, "total": 12.0},
    ],
    "items": [
        {"id": 100, "order_id": 10, "sku": "A-1"},
        {"id": 101, "order_id": 10, "sku": "B-2"},
    ],
}


def _canned_transport(url: str, timeout: float) -> str:
    endpoint = url.rstrip("/").rsplit("/", 1)[-1]
    return json.dumps(_CANNED.get(endpoint, []))


def main(warehouse_path: str | None = None) -> None:
    spark = get_spark("example_load_from_api")
    warehouse_path = warehouse_path or tempfile.mkdtemp(prefix="wh_api_")
    wh = Warehouse(warehouse_path)
    loader = SparkLoader(spark, wh)
    source = RestSource("https://api.example.test/v1", transport=_canned_transport)

    endpoint_configs = {
        "customers": LoaderConfig(write_mode="overwrite", schema_evolution=True),
        "orders": LoaderConfig(join_cols=("id",), schema_evolution=True),
    }
    default_config = LoaderConfig(write_mode="append", schema_evolution=True)

    for endpoint in ("customers", "orders", "items"):
        config = endpoint_configs.get(endpoint, default_config)
        logger.info("Loading %s with mode %s", endpoint, config.write_mode)
        rows: list[dict] = []
        for batch in source.get_data(endpoint):
            rows.extend(batch)
        if not rows:
            logger.warning("No data for %s, skipping", endpoint)
            continue
        result = loader.load_data(rows, f"default.{endpoint}", config)
        logger.info("Loaded %s: %s", endpoint, result)

    assert wh.load_table("default.customers").scan(spark).count() == 2
    assert wh.load_table("default.orders").scan(spark).count() == 2
    assert wh.load_table("default.items").scan(spark).count() == 2

    # upsert endpoint replayed with one changed + one new row
    _CANNED["orders"] = [
        {"id": 11, "customer_id": 2, "total": 15.0},
        {"id": 12, "customer_id": 1, "total": 7.25},
    ]
    for batch in source.get_data("orders"):
        loader.load_data(batch, "default.orders", endpoint_configs["orders"])
    totals = {
        r.id: r.total
        for r in wh.load_table("default.orders").scan(spark).collect()
    }
    assert totals == {10: 99.5, 11: 15.0, 12: 7.25}, totals
    logger.info("Upsert replay verified: %s", totals)


if __name__ == "__main__":
    main()
    print("OK")
