"""Subprocess worker for the cross-process HTTP-catalog race test.

Each worker is a REAL separate OS process with its own SparkSession and
its own HttpCatalogStore client; the only shared state is the catalog
HTTP endpoint (CAS linearization point) and the warehouse directory the
parquet data files land in. Usage:

    python _http_race_worker.py <catalog_url> <warehouse_root> <wid> <n>
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    url, root, wid_s, n_s = sys.argv[1:5]
    wid, n = int(wid_s), int(n_s)

    from pyspark.sql import SparkSession

    from iceberg_loader_spark.loader import SparkLoader
    from iceberg_loader_spark.tables import Warehouse
    from iceberg_loader_spark.tables.httpcatalog import HttpCatalogStore
    from iceberg_loader_spark.tables.objectstore import ObjectStoreBackend

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"http_race_w{wid}")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    wh = Warehouse(
        root,
        backend_factory=lambda r: ObjectStoreBackend(HttpCatalogStore(url), r),
    )
    loader = SparkLoader(spark, wh)

    # file-based barrier: don't start appending until BOTH workers have a
    # live SparkSession, so the commit races actually overlap
    ready = os.path.join(root, f"_ready_{wid}")
    other = os.path.join(root, f"_ready_{3 - wid}")
    open(ready, "w").close()
    deadline = time.time() + 120
    while not os.path.exists(other):
        if time.time() > deadline:
            print("BARRIER TIMEOUT", file=sys.stderr)
            return 2
        time.sleep(0.05)

    for i in range(n):
        res = loader.load_data(
            [{"id": wid * 1000 + i, "w": wid}], "db.race_px"
        )
        print(f"w{wid} append {i}: {res['rows_loaded']} rows", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
