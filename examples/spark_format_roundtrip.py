"""The `sparkberg` Spark format: read/write tables with no engine API.

The reference exposes its tables to other engines only through an
external Trino/Hive stack (``/root/reference/examples/docker-compose.yml``);
here the table format itself registers as a Spark data source, so plain
``spark.read`` / ``df.write`` work:

* ``df.write.format("sparkberg").mode("append").save(root)`` — staged
  parquet + the same optimistic CAS commit the engine API uses
  (auto-creates the table on first write),
* ``spark.read.format("sparkberg").load(root)`` — snapshot reads with
  ``version=`` / ``tag=`` time travel options,
* filter pushdown: pushed comparisons prune manifest entries by column
  min/max before any file opens (and Spark still applies every filter
  row-level, so pruning can never change results).

Run: ``python examples/spark_format_roundtrip.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging
import tempfile

from pyspark.sql import functions as F

from iceberg_loader_spark import Warehouse, get_spark, register_data_source

logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
logger = logging.getLogger("spark_format_roundtrip")


def main(base_dir: str | None = None):
    spark = get_spark("spark-format-roundtrip", master="local[4]")
    register_data_source(spark)
    wh = Warehouse(base_dir or tempfile.mkdtemp(prefix="sparkberg_fmt_"))
    root = wh.table_root("db.metrics")

    # 1. first write auto-creates; second appends a new snapshot
    spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.format("sparkberg").mode("append").save(root)
    spark.range(100, 150).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.format("sparkberg").mode("append").save(root)
    assert spark.read.format("sparkberg").load(root).count() == 150

    # 2. the engine API sees the same commits — tag the first append
    t = wh.load_table("db.metrics")
    versions = [s.version for s in t.history() if s.operation == "append"]
    t.set_tag("first-load", versions[0])
    tagged = (
        spark.read.format("sparkberg").option("tag", "first-load").load(root)
    )
    assert tagged.count() == 100

    # 3. pushed filter prunes to the one file whose stats can match
    hit = (
        spark.read.format("sparkberg")
        .load(root)
        .filter(F.col("k") == 120)
        .collect()
    )
    assert [(r.k, r.v) for r in hit] == [(120, 240)]
    for f in t.snapshot().files:
        logger.info(
            "file %s k-range=%s", f.path.rsplit("/", 1)[-1], f.stats.get("k")
        )

    logger.info("OK")
    return {"rows": 150, "tagged_rows": 100}


if __name__ == "__main__":
    main()
