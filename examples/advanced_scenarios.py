"""Five end-to-end load scenarios against the embedded warehouse.

Spark-first port of the reference example
``/root/reference/examples/advanced_scenarios.py``: initial partitioned
append with the audit column, append into a new partition, idempotent
partition replace, schema evolution, and full overwrite.

Run: ``python examples/advanced_scenarios.py``
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

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
)
logger = logging.getLogger(__name__)


def drop_if_exists(wh: Warehouse, identifier: str) -> None:
    if wh.table_exists(identifier):
        wh.drop_table(identifier)
        logger.info("Dropped existing table %s", identifier)


def verify_table(spark, wh: Warehouse, identifier: str, expected_rows: int):
    rows = wh.load_table(identifier).scan(spark).count()
    assert rows == expected_rows, (
        f"{identifier}: expected {expected_rows} rows, got {rows}"
    )
    logger.info(
        "Verified: Table %s has %s rows (Expected: %s)",
        identifier,
        rows,
        expected_rows,
    )


def scenario_initial_append(spark, wh, loader):
    identifier = "default.advanced_s1_initial_append"
    drop_if_exists(wh, identifier)
    data_day_1 = [
        {"id": 1, "category": "A", "ts": "2023-01-01", "value": 100},
        {"id": 2, "category": "B", "ts": "2023-01-01", "value": 200},
    ]
    config = LoaderConfig(
        write_mode="append", partition_by="day(ts)", schema_evolution=True
    )
    loader.load_data(data_day_1, identifier, config)
    df = wh.load_table(identifier).scan(spark)
    assert "_load_dttm" in df.columns
    assert df.filter(df._load_dttm.isNotNull()).count() == 2
    logger.info("Verified: '_load_dttm' column exists and populated.")
    verify_table(spark, wh, identifier, expected_rows=2)


def scenario_append_new_partition(spark, wh, loader):
    identifier = "default.advanced_s2_append_partition"
    drop_if_exists(wh, identifier)
    day_1 = [
        {"id": 1, "category": "A", "ts": "2023-01-01", "value": 100},
        {"id": 2, "category": "B", "ts": "2023-01-01", "value": 200},
    ]
    loader.load_data(
        day_1,
        identifier,
        LoaderConfig(
            write_mode="append", partition_by="month(ts)", schema_evolution=True
        ),
    )
    day_2 = [{"id": 3, "category": "A", "ts": "2023-01-02", "value": 150}]
    loader.load_data(day_2, identifier, LoaderConfig(write_mode="append"))
    verify_table(spark, wh, identifier, expected_rows=3)


def scenario_idempotent_replace_partition(spark, wh, loader):
    identifier = "default.advanced_s3_idempotent_replace"
    drop_if_exists(wh, identifier)
    base = [
        {"id": 1, "category": "A", "ts": "2023-01-01", "value": 100},
        {"id": 2, "category": "B", "ts": "2023-01-01", "value": 200},
        {"id": 3, "category": "A", "ts": "2023-01-02", "value": 150},
    ]
    loader.load_data(
        base,
        identifier,
        LoaderConfig(
            write_mode="append", partition_by="day(ts)", schema_evolution=True
        ),
    )
    # re-run day 1 with corrected values: replace_filter deletes the
    # partition once, then appends the corrected rows (idempotent replay)
    corrected_day1 = [
        {"id": 1, "category": "A", "ts": "2023-01-01", "value": 999},
        {"id": 2, "category": "B", "ts": "2023-01-01", "value": 200},
    ]
    loader.load_data(
        corrected_day1,
        identifier,
        LoaderConfig(write_mode="append", replace_filter="ts == '2023-01-01'"),
    )
    verify_table(spark, wh, identifier, expected_rows=3)
    vals = {
        r.id: r.value
        for r in wh.load_table(identifier).scan(spark).collect()
    }
    assert vals == {1: 999, 2: 200, 3: 150}, vals
    logger.info("Verified: day-1 partition replaced, day-2 untouched.")


def scenario_schema_evolution(spark, wh, loader):
    identifier = "default.advanced_s4_schema_evolution"
    drop_if_exists(wh, identifier)
    base = [{"id": 1, "category": "A", "ts": "2023-01-01", "value": 100}]
    loader.load_data(
        base,
        identifier,
        LoaderConfig(
            write_mode="append", partition_by="day(ts)", schema_evolution=True
        ),
    )
    evolved = [
        {
            "id": 2,
            "category": "B",
            "ts": "2023-01-02",
            "value": 200,
            "new_col": "extra_info",
        }
    ]
    loader.load_data(
        evolved,
        identifier,
        LoaderConfig(write_mode="append", schema_evolution=True),
    )
    verify_table(spark, wh, identifier, expected_rows=2)
    t = wh.load_table(identifier)
    assert "new_col" in [f.name for f in t.schema().fields]
    logger.info("SUCCESS: Schema evolved, 'new_col' found.")


def scenario_full_overwrite(spark, wh, loader):
    identifier = "default.advanced_s5_full_overwrite"
    drop_if_exists(wh, identifier)
    initial = [
        {"id": 1, "category": "A", "ts": "2023-01-01", "value": 100},
        {"id": 2, "category": "B", "ts": "2023-01-02", "value": 200},
    ]
    loader.load_data(
        initial,
        identifier,
        LoaderConfig(
            write_mode="append", partition_by="day(ts)", schema_evolution=True
        ),
    )
    replace_all = [
        {
            "id": 99,
            "category": "Z",
            "ts": "2023-12-31",
            "value": 0,
            "new_col": "reset",
        }
    ]
    loader.load_data(
        replace_all,
        identifier,
        LoaderConfig(write_mode="overwrite", schema_evolution=True),
    )
    verify_table(spark, wh, identifier, expected_rows=1)


def run_scenarios(warehouse_path: str | None = None) -> None:
    spark = get_spark("example_advanced_scenarios")
    warehouse_path = warehouse_path or tempfile.mkdtemp(prefix="wh_advanced_")
    wh = Warehouse(warehouse_path)
    loader = SparkLoader(spark, wh)
    logger.info("--- Scenario 1: Initial Load (Append) ---")
    scenario_initial_append(spark, wh, loader)
    logger.info("--- Scenario 2: Append data for new partition ---")
    scenario_append_new_partition(spark, wh, loader)
    logger.info("--- Scenario 3: Idempotent Replace (Day 1) ---")
    scenario_idempotent_replace_partition(spark, wh, loader)
    logger.info("--- Scenario 4: Schema Evolution (Add Column) ---")
    scenario_schema_evolution(spark, wh, loader)
    logger.info("--- Scenario 5: Full Overwrite ---")
    scenario_full_overwrite(spark, wh, loader)


if __name__ == "__main__":
    run_scenarios()
    print("OK")
