"""Round-5 additions as a user script: incremental fuzzy-dedup ingest
and graph-ANN retrieval.

1. Split the documents corpus into a HISTORICAL half and an INCOMING
   batch (stable md5(doc_id) bucket — the same split every incremental
   operator uses).
2. Run the incremental MinHash/LSH pass: historical signatures are
   persisted in an index table, the shingle pipeline runs only over the
   incoming batch, and candidate near-dup pairs always touch at least
   one new document (`operators/dedup.incremental_minhash_candidates`
   is the oracle-gated form).
3. Land only the documents with NO near-dup against the index (plus the
   older member of each new-new pair) into a warehouse table.
4. Retrieve over the embeddings with the navigable-graph beam search
   (`operators/similarity.graph_ann_beam_search`).

Run: ``python examples/incremental_dedup_and_graph_ann.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging
import tempfile

from pyspark.sql import functions as F

from iceberg_loader_spark import get_spark
from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables.table import Table

logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(message)s")
logger = logging.getLogger(__name__)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def run_example(warehouse_path: str | None = None) -> dict:
    from iceberg_loader_spark.operators.dedup import (
        incremental_minhash_candidates,
    )
    from iceberg_loader_spark.operators.similarity import (
        graph_ann_beam_search,
    )
    from iceberg_loader_spark.operators.text import _bucket_col
    from iceberg_loader_spark.sources.tables import load_table

    spark = get_spark("example_incremental_dedup")
    warehouse_path = warehouse_path or tempfile.mkdtemp(prefix="wh_incdedup_")
    wh = Warehouse(warehouse_path)

    docs = load_table(spark, SF_DIR, "documents")
    incoming = docs.withColumn("bucket", _bucket_col()).filter(
        F.col("bucket") >= 50
    )
    n_incoming = incoming.count()

    # near-dup pairs touching the incoming batch (index-driven; the
    # historical half is never re-shingled inside the operator)
    pairs = incremental_minhash_candidates(spark, SF_DIR)
    n_pairs = pairs.count()

    # suppress the NEW member of every candidate pair. a_id/b_id are
    # ordered by id, NOT by age — for a new_old pair the incoming doc can
    # sit on either side, so pick the side that is in the incoming batch
    # (the historical member is the canonical keeper already in the
    # index). For new_new pairs both are incoming: keep the smaller id.
    incoming_ids = incoming.select("doc_id")
    both_sides = pairs.filter(F.col("pair_kind") == "new_old").select(
        F.explode(F.array("a_id", "b_id")).alias("doc_id")
    ).join(incoming_ids, "doc_id", "left_semi")
    new_new_losers = pairs.filter(F.col("pair_kind") == "new_new").select(
        F.col("b_id").alias("doc_id")
    )
    suppressed = both_sides.unionByName(new_new_losers).distinct()
    novel = incoming.join(suppressed, "doc_id", "left_anti").drop("bucket")
    t = Table.create(wh, "db.curated_incoming", novel.schema)
    t.append(novel)
    n_landed = wh.load_table("db.curated_incoming").scan(spark).count()
    logger.info(
        "incoming=%d neardup_pairs=%d landed=%d",
        n_incoming, n_pairs, n_landed,
    )

    # graph-ANN retrieval over the embeddings corpus
    hits = graph_ann_beam_search(spark, SF_DIR)
    n_hits = hits.count()
    top = hits.orderBy("q_id", "rnk").first()
    logger.info("beam-search results=%d first=%s", n_hits, top)

    assert n_landed <= n_incoming
    assert n_hits > 0
    return {
        "n_incoming": n_incoming,
        "n_neardup_pairs": n_pairs,
        "n_landed": n_landed,
        "n_beam_hits": n_hits,
    }


if __name__ == "__main__":
    out = run_example()
    print(f"OK {out}")
