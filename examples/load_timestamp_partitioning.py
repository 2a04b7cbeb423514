"""Partitioning by load timestamp — safe transforms vs rejected identity.

Spark-first port of
``/root/reference/examples/load_timestamp_partitioning.py``: identity
partitioning on the load-timestamp column is rejected at config time
(every load would create a new partition), while time transforms like
``day(_load_dttm)`` are the safe spelling.

Run: ``python examples/load_timestamp_partitioning.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging
import tempfile

from iceberg_loader_spark import get_spark
from iceberg_loader_spark.config import ConfigError, LoaderConfig
from iceberg_loader_spark.loader import SparkLoader
from iceberg_loader_spark.tables import Warehouse

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
)
logger = logging.getLogger(__name__)


def show_invalid_identity_partition() -> None:
    """Identity on the load-ts column is rejected (exploding partitions)."""
    try:
        LoaderConfig(load_timestamp=True, partition_by="_load_dttm")
        raise AssertionError("identity partition on _load_dttm was accepted")
    except ConfigError as exc:
        logger.info("Identity partition on _load_dttm is invalid:\n%s", exc)


def main(warehouse_path: str | None = None) -> dict:
    show_invalid_identity_partition()

    spark = get_spark("example_ts_partitioning")
    warehouse_path = warehouse_path or tempfile.mkdtemp(prefix="wh_tspart_")
    wh = Warehouse(warehouse_path)
    identifier = "default.load_ts_partition_demo"
    if wh.table_exists(identifier):
        wh.drop_table(identifier)
        logger.info("Dropped existing table %s", identifier)

    data = [
        {"id": 1, "event": "a"},
        {"id": 2, "event": "b"},
        {"id": 3, "event": "c"},
    ]
    config = LoaderConfig(
        write_mode="append",
        load_timestamp=True,
        partition_by="day(_load_dttm)",  # safe transform on the load ts
    )
    logger.info("Loading with partition_by=%s", config.partition_by)
    loader = SparkLoader(spark, wh)
    result = loader.load_data(data, identifier, config)
    logger.info("Load result: %s", result)

    table = wh.load_table(identifier)
    spec = table.partition_spec()
    logger.info("Partition spec: %s", [pf.to_json() for pf in spec])
    n = table.scan(spark).count()
    logger.info("Row count: %s", n)
    assert n == 3
    assert spec and spec[0].transform == "day" and spec[0].source == "_load_dttm"
    # every row landed in ONE partition (single load day), not three
    parts = {tuple(f.partition.items()) for f in table.snapshot().files}
    assert len(parts) == 1, parts
    return result


if __name__ == "__main__":
    main()
    print("OK")
