"""Hotfix + cherry-pick flow over a shared HTTP catalog: the publish
path ``fast_forward_branch`` cannot handle, end to end.

The scenario a long-running ingestion hits (Iceberg's
``cherrypick_snapshot`` — cf. `docs/table_format.md` "Branch refs"):

1. main holds the released corpus; every metadata commit goes through a
   shared HTTP catalog (server-side ETag compare-and-swap — the sandbox
   equivalent of the reference's Trino + HMS + MinIO stack,
   ref examples/docker-compose.yml);
2. a CANDIDATE branch stages the next batch's append;
3. an urgent HOTFIX lands on main first — a merge-on-read delete of a
   bad source — so main has DIVERGED from the fork and fast-forward
   refuses;
4. ``cherry_pick`` applies the branch's append as a NEW main commit:
   the picked files take the new data sequence, so the hotfix predicate
   (lower sequence) does not touch the picked rows even where it
   textually matches them;
5. a second client stack attaches to the same catalog and reads the
   same table — the swap a production deployment performs.

Run: ``python examples/hotfix_cherry_pick.py``
"""

from __future__ import annotations

import logging
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_loader_spark import get_spark
from iceberg_loader_spark.sources.tables import load_table
from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables.format import ConcurrentModification
from iceberg_loader_spark.tables.httpcatalog import (
    CatalogHTTPServer,
    HttpCatalogStore,
)
from iceberg_loader_spark.tables.objectstore import ObjectStoreBackend
from iceberg_loader_spark.tables.table import Table

logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
log = logging.getLogger("hotfix_cherry_pick")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def run_example(warehouse_path: str | None = None) -> dict:
    spark = get_spark("example_hotfix_cherry_pick")
    root = warehouse_path or tempfile.mkdtemp(prefix="wh_hotfix_")
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )

    with CatalogHTTPServer() as url:
        store = HttpCatalogStore(url)
        wh = Warehouse(
            root, backend_factory=lambda r: ObjectStoreBackend(store, r)
        )

        # 1. released corpus, committed through the HTTP catalog
        t = Table.create(wh, "corpus.docs", docs.schema)
        t.append(docs.filter(F.col("lang") != "zh"))
        t = wh.load_table("corpus.docs")
        n_released = t.scan(spark).count()

        # 2. candidate branch stages the new zh batch
        t.create_branch("candidate")
        t.branch("candidate").append(docs.filter(F.col("lang") == "zh"))

        # 3. hotfix lands on MAIN first: drop a bad source (MoR delete)
        t.delete_where(spark, "source = 'src0'", mode="mor")
        t = wh.load_table("corpus.docs")
        n_hotfixed = t.scan(spark).count()
        try:
            t.fast_forward_branch(t.branch("candidate"))
            raise AssertionError("fast-forward must refuse a diverged main")
        except ConcurrentModification:
            log.info("fast-forward refused (main diverged) — cherry-picking")

        # 4. cherry-pick: the zh append lands as a new commit; its files
        # take the new sequence, so the hotfix predicate doesn't touch
        # zh rows from src0 even though it textually matches them
        snap = t.cherry_pick(t.branch("candidate"))
        t = wh.load_table("corpus.docs")
        n_final = t.scan(spark).count()
        n_zh_src0 = (
            t.scan(spark)
            .filter((F.col("lang") == "zh") & (F.col("source") == "src0"))
            .count()
        )
        log.info(
            "cherry-picked v%d (source %s): %d rows, %d zh/src0 survivors",
            snap.version,
            snap.summary["cherry-pick-source"][:8],
            n_final,
            n_zh_src0,
        )

        # 5. the catalog swap: a brand-new client stack reads the same table
        wh2 = Warehouse(
            root,
            backend_factory=lambda r: ObjectStoreBackend(
                HttpCatalogStore(url), r
            ),
        )
        n_second_client = wh2.load_table("corpus.docs").scan(spark).count()

    return {
        "released_rows": n_released,
        "after_hotfix": n_hotfixed,
        "after_cherry_pick": n_final,
        "zh_src0_survivors": n_zh_src0,
        "second_client_rows": n_second_client,
        "versions": snap.version,
    }


if __name__ == "__main__":
    out = run_example()
    log.info("result: %s", out)
