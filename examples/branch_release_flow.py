"""Branch-based release flow: stage risky changes on a writable branch,
audit them in isolation, fast-forward on pass, tag the release.

The pattern a training-data release process runs (Iceberg branch
semantics — cf. `docs/table_format.md` "Branch refs"):

1. main holds the last released corpus;
2. a CANDIDATE branch takes the new batch's append AND a row-level
   cleanup delete — main stays frozen and serveable the whole time;
3. the audit queries run against the branch head (same scan API);
4. on pass, ``fast_forward_branch`` replays the branch's commits onto
   main 1:1 (versions + delete sequences preserved), and the released
   version gets a retention-pinning tag;
5. on fail, ``abort_branch`` would discard the staged files.

Run: ``python examples/branch_release_flow.py``
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
from iceberg_loader_spark.tables.table import Table

logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
log = logging.getLogger("branch_release_flow")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def run_example(warehouse_path: str | None = None) -> dict:
    spark = get_spark("example_branch_release")
    wh = Warehouse(warehouse_path or tempfile.mkdtemp(prefix="wh_branch_"))
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )

    # 1. main = last release (everything but the new zh batch)
    t = Table.create(wh, "corpus.docs", docs.schema)
    t.append(docs.filter(F.col("lang") != "zh"))
    t = wh.load_table("corpus.docs")
    released_v = t.meta.current_version()
    main_before = t.scan(spark).count()

    # 2. candidate branch: land the new batch + a cleanup delete
    br = t.create_branch("candidate")
    br.append(docs.filter(F.col("lang") == "zh"))
    t.branch("candidate").delete_where(spark, "n_chars < 20")

    # 3. audit the BRANCH head while main serves the old release
    head = t.branch("candidate").scan(spark)
    n_branch = head.count()
    n_short = head.filter(F.col("n_chars") < 20).count()
    assert n_short == 0, "cleanup delete must have landed on the branch"
    assert t.scan(spark).count() == main_before, "main must be frozen"
    log.info("audit pass: branch=%d rows, main still %d", n_branch, main_before)

    # 4. publish: replay the branch commits onto main, tag the release
    t.fast_forward_branch(t.branch("candidate"))
    t = wh.load_table("corpus.docs")
    t.set_tag("release-2")
    t = wh.load_table("corpus.docs")
    main_after = t.scan(spark).count()
    # time travel still reads the previous release
    prev = t.scan(spark, version=released_v).count()

    return {
        "main_before": main_before,
        "branch_head": n_branch,
        "main_after": main_after,
        "previous_release_rows": prev,
        "history_ops": [s.operation for s in t.history()],
        "tags": t.tags(),
    }


if __name__ == "__main__":
    out = run_example()
    log.info("result: %s", out)
