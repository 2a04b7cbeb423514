"""Ingestion baseline (BASELINE.md §"Baseline to be measured").

Measures the Part A write path at a given scale factor against a local
warehouse: plain append, partitioned append, upsert (MERGE), idempotent
replace-by-filter, snapshot expiry after many appends, and compaction.
Prints one JSON line; numbers are recorded in BASELINE.md.

Usage: python tools/bench_ingest.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_loader_spark import get_spark
from iceberg_loader_spark.config import LoaderConfig
from iceberg_loader_spark.loader import SparkLoader
from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables.maintenance import (
    expire_snapshots,
    rewrite_data_files,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-ingest")
    spark.range(1).count()  # JVM warm-up

    lineitem = pq.read_table(f"{sf_dir}/lineitem.parquet")
    orders = pq.read_table(f"{sf_dir}/orders.parquet")
    mb = lineitem.nbytes / 1e6

    out: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        wh = Warehouse(os.path.join(tmp, "warehouse"))
        loader = SparkLoader(spark, wh)

        # 1. plain append (lineitem, unpartitioned)
        t0 = time.perf_counter()
        loader.load_data(lineitem, "db.lineitem", LoaderConfig(commit_interval=100))
        out["append_lineitem_s"] = round(time.perf_counter() - t0, 3)
        out["append_lineitem_mb_s"] = round(mb / out["append_lineitem_s"], 1)

        # 2. partitioned append: day(l_shipdate)
        t0 = time.perf_counter()
        loader.load_data(
            lineitem,
            "db.lineitem_part",
            LoaderConfig(partition_by="day(l_shipdate)", commit_interval=100),
        )
        out["append_partitioned_s"] = round(time.perf_counter() - t0, 3)

        # 3. upsert 10% of orders by o_orderkey (half changed, half new keys)
        loader.load_data(orders, "db.orders", LoaderConfig(commit_interval=100))
        n = orders.num_rows
        upd = orders.slice(0, n // 10)
        t0 = time.perf_counter()
        loader.load_data(
            upd, "db.orders", LoaderConfig(join_cols=("o_orderkey",))
        )
        out["upsert_10pct_orders_s"] = round(time.perf_counter() - t0, 3)

        # 4. idempotent replace of one ship-day
        t0 = time.perf_counter()
        loader.load_data(
            lineitem.slice(0, 1000),
            "db.lineitem",
            LoaderConfig(replace_filter="l_linenumber == 1"),
        )
        out["replace_filter_s"] = round(time.perf_counter() - t0, 3)

        # 5. 20 small appends then expire to last 5 snapshots
        small = orders.slice(0, 500)
        for _ in range(20):
            loader.load_data(small, "db.churn")
        t = wh.load_table("db.churn")
        t0 = time.perf_counter()
        expire_snapshots(t, keep_last=5)
        out["expire_snapshots_s"] = round(time.perf_counter() - t0, 3)

        # 6. compaction of the churned table
        t0 = time.perf_counter()
        rewrite_data_files(t, spark)
        out["rewrite_data_files_s"] = round(time.perf_counter() - t0, 3)

        out["lineitem_rows"] = lineitem.num_rows
        out["lineitem_mb"] = round(mb, 1)
        print(json.dumps({"metric": "ingest_bench", "sf_dir": sf_dir, **out}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
