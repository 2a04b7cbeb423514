"""Signed-delta materialized-view refresh (operators/lifecycle.py:
apply_mv_delta) — the zeroed-key branch the registered query's data never
exercises: a key whose signed count reaches zero must LEAVE the MV, and a
key the delta doesn't touch must survive unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_loader_spark.operators.lifecycle import apply_mv_delta
from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables.table import Table


def _mv_rows(spark, wh, name):
    return {
        r["k"]: (r["n_rows"], r["sum_v"])
        for r in wh.load_table(name).scan(spark).collect()
    }


def test_apply_mv_delta_removes_zeroed_keys(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    mv_df = spark.createDataFrame(
        [(1, 2, 20), (2, 1, 7), (3, 4, 40)], "k long, n_rows long, sum_v long"
    )
    Table.create(wh, "db.mv", mv_df.schema).append(mv_df)

    # k=1 loses both rows (→ must vanish), k=2 gains one, k=4 is new,
    # k=3 is untouched
    delta = spark.createDataFrame(
        [(1, -2, -20), (2, 1, 3), (4, 2, 8)],
        "k long, n_rows long, sum_v long",
    )
    apply_mv_delta(spark, wh, "db.mv", delta, "k", ("n_rows", "sum_v"))

    assert _mv_rows(spark, wh, "db.mv") == {
        2: (2, 10),
        3: (4, 40),
        4: (2, 8),
    }


def test_apply_mv_delta_insert_only(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    mv_df = spark.createDataFrame([(1, 1, 5)], "k long, n_rows long, sum_v long")
    Table.create(wh, "db.mv", mv_df.schema).append(mv_df)
    delta = spark.createDataFrame([(1, 2, 6)], "k long, n_rows long, sum_v long")
    apply_mv_delta(spark, wh, "db.mv", delta, "k", ("n_rows", "sum_v"))
    assert _mv_rows(spark, wh, "db.mv") == {1: (3, 11)}
