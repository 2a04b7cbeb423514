"""Merge-on-read, snapshot tags, and the streaming table tail.

The write-optimized lakehouse loop a high-frequency ingest pipeline
runs: MoR upserts land in O(source) commits, a MoR delete is a pure
metadata commit, a tag pins the released snapshot against expiry, a
tail reader streams every committed delta downstream, and compaction
eventually materializes the deferred deletes.

Run: ``python examples/mor_tags_and_tail.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_loader_spark import get_spark
from iceberg_loader_spark.streaming import TableTailReader
from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables.maintenance import rewrite_data_files
from iceberg_loader_spark.tables.table import Table

logging.basicConfig(
    level=logging.INFO, format="%(levelname)s %(name)s: %(message)s"
)
log = logging.getLogger("mor_tags_and_tail")


def main() -> None:
    spark = get_spark("mor-example")
    wh = Warehouse(tempfile.mkdtemp(prefix="mor_example_"))
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("plan", T.StringType()),
            T.StructField("spend", T.LongType()),
        ]
    )
    t = Table.create(wh, "db.accounts", schema)

    # a tail reader attached BEFORE any commit sees every delta
    tail = TailCollector(t)

    t.append(spark.createDataFrame(
        [(1, "free", 0), (2, "pro", 40), (3, "free", 0)], schema
    ))
    tail.drain(spark)

    # release snapshot: tag it — expire_snapshots will never drop it
    t.set_tag("release-2026-08")
    log.info("tags: %s", t.tags())

    # write-optimized upsert: target is never read; one equality-delete
    # file + the new rows commit in O(source)
    t.merge(
        spark,
        spark.createDataFrame([(2, "pro", 55), (4, "pro", 10)], schema),
        ["user_id"],
        mode="mor",
    )
    tail_note = "(tail sees appends only; upserts/deletes need Table.changes)"
    log.info("after MoR upsert: %s %s", _rows(spark, t), tail_note)

    # pure-metadata delete: nothing rewritten
    t.delete_where(spark, "plan == 'free'", mode="mor")
    log.info("after MoR delete: %s", _rows(spark, t))
    log.info(
        "pending deletes: %d predicates, %d equality files",
        len(t.snapshot().delete_predicates),
        len(t.snapshot().delete_files),
    )

    # time travel by tag: the release is untouched by everything above
    log.info(
        "release tag still reads: %s",
        sorted(r["user_id"] for r in t.scan(spark, tag="release-2026-08").collect()),
    )

    # compaction materializes the deferred deletes
    rewrite_data_files(t, spark, target_files=1)
    snap = t.snapshot()
    log.info(
        "after compaction: %s (pending: %d/%d)",
        _rows(spark, t),
        len(snap.delete_predicates),
        len(snap.delete_files),
    )


def _rows(spark, t: Table) -> list[tuple]:
    return sorted(
        (r["user_id"], r["plan"], r["spend"])
        for r in t.scan(spark).collect()
    )


class TailCollector:
    """Minimal consumer over TableTailReader.batches()."""

    def __init__(self, t: Table):
        self.reader = TableTailReader(t, from_version=t.meta.current_version())

    def drain(self, spark) -> None:
        for batch in self.reader.batches(spark):
            log.info(
                "tail batch @v%d: %d rows",
                self.reader.position,
                batch.count(),
            )


if __name__ == "__main__":
    main()
