"""Incremental materialized-view maintenance as a user script: a
per-supplier sales rollup that stays current through appends AND deletes
without ever recomputing from the full table.

1. Land a base batch of lineitem sales into a warehouse table and build
   the MV (per-supplier row count / quantity / cents sums) once.
2. Append a second batch, then run a copy-on-write predicate DELETE.
3. Read BOTH commits back as one signed changes() changelog (+1 insert /
   -1 delete), aggregate the signed delta per key, and apply it with
   ``apply_mv_delta`` — affected keys merge, zeroed keys leave the MV.
4. Assert the maintained MV equals a full recompute over the table.

At 100 TB the difference is the whole point: the refresh touches only
the churned files and affected MV keys, never the table.

Run: ``python examples/incremental_mv_refresh.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging
import tempfile

from pyspark.sql import functions as F

from iceberg_loader_spark import get_spark
from iceberg_loader_spark.operators.lifecycle import apply_mv_delta
from iceberg_loader_spark.sources.tables import load_table
from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables.table import Table

logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(message)s")
logger = logging.getLogger(__name__)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
VAL_COLS = ("n_rows", "sum_qty", "sum_cents")


def _agg(df, sign):
    return df.groupBy("l_suppkey").agg(
        F.sum(sign).cast("bigint").alias("n_rows"),
        F.sum(sign * F.col("qty")).cast("bigint").alias("sum_qty"),
        F.sum(sign * F.col("cents")).cast("bigint").alias("sum_cents"),
    )


def run_example(warehouse_path: str | None = None) -> dict:
    spark = get_spark("example_incremental_mv")
    wh = Warehouse(warehouse_path or tempfile.mkdtemp(prefix="wh_mv_"))

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("cents"),
    )

    # 1. base batch + MV build (the only full-table aggregate ever run)
    t = Table.create(wh, "db.sales", li.schema)
    t.append(li.filter(F.col("l_orderkey") % 2 == 0))
    mv_df = _agg(wh.load_table("db.sales").scan(spark), F.lit(1))
    Table.create(wh, "db.mv", mv_df.schema).append(mv_df)
    logger.info("MV built: %d supplier keys", mv_df.count())

    # 2. churn: an append and a predicate delete
    t = wh.load_table("db.sales")
    base = t.meta.current_version()
    t.append(li.filter(F.col("l_orderkey") % 2 == 1))
    t = wh.load_table("db.sales")
    t.delete_where(spark, "qty >= 45")
    t = wh.load_table("db.sales")

    # 3. one signed changelog over both commits → per-key delta → apply
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = _agg(t.changes(spark, base), sign).filter(
        (F.col("n_rows") != 0)
        | (F.col("sum_qty") != 0)
        | (F.col("sum_cents") != 0)
    )
    n_delta_keys = delta.count()
    apply_mv_delta(spark, wh, "db.mv", delta, "l_suppkey", VAL_COLS)
    logger.info("delta applied: %d affected keys", n_delta_keys)

    # 4. the maintained MV must equal a full recompute
    maintained = wh.load_table("db.mv").scan(spark)
    recomputed = _agg(wh.load_table("db.sales").scan(spark), F.lit(1))
    diff = maintained.unionByName(recomputed).groupBy("l_suppkey").agg(
        F.count("*").alias("n"),
        F.count_distinct(F.struct(*VAL_COLS)).alias("nv"),
    ).filter((F.col("n") != 2) | (F.col("nv") != 1))
    n_mismatch = diff.count()
    result = {
        "n_mv_keys": maintained.count(),
        "n_delta_keys": n_delta_keys,
        "n_mismatch": n_mismatch,
    }
    logger.info("result: %s", result)
    assert n_mismatch == 0, "maintained MV diverged from full recompute"
    return result


if __name__ == "__main__":
    run_example()
    print("OK")
