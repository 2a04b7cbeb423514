"""E2E chained lifecycle, mirroring the reference's docker-backed examples
CI (tools/run_examples_smoke.sh + examples/advanced_scenarios.py row-count
asserts): create → append → mixed-schema evolution mid-stream → idempotent
replace → upsert → many appends → expire → compact, with row counts and
snapshot counts checked at each stage against one embedded warehouse."""

from __future__ import annotations

import pyarrow as pa
import pytest

from iceberg_loader_spark.config import LoaderConfig
from iceberg_loader_spark.loader import SparkLoader
from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables.maintenance import (
    expire_snapshots,
    rewrite_data_files,
)


@pytest.fixture()
def wh(tmp_path):
    return Warehouse(str(tmp_path / "wh"))


def test_full_lifecycle(spark, wh):
    loader = SparkLoader(spark, wh)
    tid = "db.events_lifecycle"

    # 1. create + append (schema inferred from first batch)
    base = [
        {"id": i, "day": f"2024-01-0{1 + i % 3}", "v": float(i)} for i in range(30)
    ]
    res = loader.load_data(base, tid, LoaderConfig(load_timestamp=False))
    assert res["new_table_created"] and res["rows_loaded"] == 30
    t = wh.load_table(tid)
    assert t.scan(spark).count() == 30

    # 2. mixed-schema batches mid-stream: a new column appears; evolution on
    evolved_rows = [{"id": 100 + i, "day": "2024-01-04", "v": 1.0, "tag": "x"}
                    for i in range(10)]
    cfg_evo = LoaderConfig(schema_evolution=True, load_timestamp=False)
    loader.load_data(evolved_rows, tid, cfg_evo)
    t = wh.load_table(tid)
    df = t.scan(spark)
    assert "tag" in df.columns
    # pre-evolution rows read back with NULL tag
    assert df.filter("tag IS NULL").count() == 30
    assert df.count() == 40

    # 3. idempotent replace of one day (run twice — same final state)
    repl = [{"id": 500 + i, "day": "2024-01-01", "v": 9.9} for i in range(5)]
    cfg_rep = LoaderConfig(replace_filter="day == '2024-01-01'",
                           load_timestamp=False)
    for _ in range(2):
        loader.load_data(repl, tid, cfg_rep)
        df = wh.load_table(tid).scan(spark)
        assert df.filter("day == '2024-01-01'").count() == 5

    # 4. upsert: update half the replacement rows, insert two new ones
    up = [{"id": 500, "day": "2024-01-01", "v": -1.0},
          {"id": 501, "day": "2024-01-01", "v": -1.0},
          {"id": 900, "day": "2024-01-05", "v": 0.5},
          {"id": 901, "day": "2024-01-05", "v": 0.5}]
    before = wh.load_table(tid).scan(spark).count()
    loader.load_data(up, tid, LoaderConfig(join_cols=("id",),
                                           load_timestamp=False))
    df = wh.load_table(tid).scan(spark)
    assert df.count() == before + 2
    assert df.filter("id = 500 AND v = -1.0").count() == 1

    # 5. churn: 10 more appends → history grows; expire to last 3
    small = pa.Table.from_pylist([{"id": 1, "day": "2024-01-06", "v": 0.0}])
    for _ in range(10):
        loader.load_data(small, tid, LoaderConfig(load_timestamp=False))
    t = wh.load_table(tid)
    assert len(t.history()) >= 10
    rows_before = t.scan(spark).count()
    out = expire_snapshots(t, keep_last=3)
    assert out["remaining"] == 3
    assert wh.load_table(tid).scan(spark).count() == rows_before  # data intact

    # 6. compaction: fewer files, same rows
    t = wh.load_table(tid)
    files_before = len(t.snapshot().files)
    rewrite_data_files(t, spark)
    t = wh.load_table(tid)
    assert len(t.snapshot().files) <= files_before
    assert t.scan(spark).count() == rows_before


def test_incremental_view_maintenance(spark, wh):
    """Materialized-aggregate maintenance: a per-key count/sum view kept
    up to date from scan_incremental deltas must equal a full recompute
    after every batch — the 100 TB pattern where the view update cost is
    proportional to the delta, never the table."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from iceberg_loader_spark.tables.table import Table

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.LongType()),
        ]
    )
    t = Table.create(wh, "db.ivm", schema)

    def agg(df):
        return df.groupBy("k").agg(
            F.count("*").alias("n"), F.sum("v").alias("s")
        )

    view = None  # materialized (k, n, s)
    last_version = None
    for batch in (
        [(1, 10), (2, 20)],
        [(1, 1), (3, 30)],
        [(2, 2), (3, 3), (3, 300)],
    ):
        t = wh.load_table("db.ivm")
        t.append(spark.createDataFrame(batch, schema))
        t = wh.load_table("db.ivm")
        cur = t.meta.current_version()
        if view is None:
            view = agg(t.scan(spark))
        else:
            delta = agg(t.scan_incremental(spark, last_version, cur))
            # merge partials: outer-join old view with delta aggregates
            view = (
                view.unionByName(delta)
                .groupBy("k")
                .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
            )
        last_version = cur
        full = agg(t.scan(spark))
        assert view.exceptAll(full).count() == 0
        assert full.exceptAll(view).count() == 0
