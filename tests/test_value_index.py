"""Secondary value index (tables/index.py): bulk build, incremental
update from the delta scan, and probe pruning — including the stale-index
failure shape (a probe through a NON-updated index misses rows that live
only in post-build files).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables.index import (
    build_value_index,
    probe_files,
    update_value_index,
)
from iceberg_loader_spark.tables.table import Table


def _mk(spark, wh, rows):
    df = spark.createDataFrame(rows, "k long, v long")
    t = Table.create(wh, "db.t", df.schema)
    t.append(df.coalesce(1))
    return wh.load_table("db.t")


def test_index_build_update_probe(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    t = _mk(spark, wh, [(1, 10), (2, 20)])
    build_value_index(spark, wh, "db.t", "db.idx", "k")
    base = t.meta.current_version()

    # second file holds k=3 only
    t.append(spark.createDataFrame([(3, 30)], "k long, v long").coalesce(1))
    t = wh.load_table("db.t")
    n_total = len(t.snapshot().files)
    assert n_total == 2

    # stale index: k=3 unfindable before the incremental update
    assert probe_files(spark, wh, "db.idx", "k", [3]) == []

    update_value_index(spark, wh, "db.t", "db.idx", "k", base)
    f3 = probe_files(spark, wh, "db.idx", "k", [3])
    assert len(f3) == 1

    # probe prunes: k=1 maps to exactly the first file, and reading only
    # that file returns exactly k=1's rows
    f1 = probe_files(spark, wh, "db.idx", "k", [1])
    assert len(f1) == 1 and f1 != f3
    got = (
        spark.read.schema(t.scan(spark).schema)
        .parquet(*f1)
        .filter(F.col("k") == 1)
        .collect()
    )
    assert [(r["k"], r["v"]) for r in got] == [(1, 10)]


def test_index_rejects_pending_mor_deletes(spark, tmp_path):
    import pytest

    wh = Warehouse(str(tmp_path / "wh"))
    t = _mk(spark, wh, [(1, 10), (2, 20)])
    t.delete_where(spark, "k == 2", mode="mor")
    with pytest.raises(ValueError, match="merge-on-read"):
        build_value_index(spark, wh, "db.t", "db.idx", "k")
