"""Table→table streaming through the registered Spark format.

An end-to-end exactly-once pipeline with NO engine-specific source
plumbing: the upstream table's append log streams through
``spark.readStream.format("sparkberg")`` (snapshot versions as
offsets), a per-batch enrichment runs, and the result lands in a
downstream table through the ``IdempotentTableSink`` (batch-id marker
committed atomically with the rows — replays are no-ops).

Run: ``python examples/stream_format_pipeline.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging
import tempfile

from pyspark.sql import functions as F

from iceberg_loader_spark import Warehouse, get_spark, register_data_source
from iceberg_loader_spark.streaming.sink import IdempotentTableSink

logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
logger = logging.getLogger("stream_format_pipeline")


def main(base_dir: str | None = None):
    spark = get_spark("stream-format-pipeline", master="local[4]")
    register_data_source(spark)
    base = base_dir or tempfile.mkdtemp(prefix="sparkberg_pipe_")
    wh = Warehouse(os.path.join(base, "wh"))
    src_root = wh.table_root("db.raw_metrics")

    # upstream: two producer commits land before the stream starts
    for lo, hi in [(0, 40), (40, 70)]:
        spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
        ).write.format("sparkberg").mode("append").save(src_root)

    sink = IdempotentTableSink(wh, "db.metrics_enriched")

    def enrich_and_land(batch_df, batch_id):
        sink(batch_df.withColumn("sq", F.col("k") * F.col("k")), batch_id)

    q = (
        spark.readStream.format("sparkberg")
        .load(src_root)
        .writeStream.foreachBatch(enrich_and_land)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()  # backfill: both existing snapshots
        n1 = wh.load_table("db.metrics_enriched").scan(spark).count()
        logger.info("after backfill: %d rows landed", n1)
        assert n1 == 70

        # a third producer commit arrives mid-stream
        spark.range(70, 100).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
        ).write.format("sparkberg").mode("append").save(src_root)
        q.processAllAvailable()
    finally:
        q.stop()

    out = wh.load_table("db.metrics_enriched").scan(spark)
    n2 = out.count()
    sq_check = out.filter(F.col("sq") != F.col("k") * F.col("k")).count()
    logger.info("final: %d rows, %d sq mismatches", n2, sq_check)
    assert n2 == 100 and sq_check == 0

    logger.info("OK")
    return {"rows_landed": n2, "skipped_batches": sink.skipped_batches}


if __name__ == "__main__":
    main()
