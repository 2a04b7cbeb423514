"""End-to-end curation pipeline: funnel the documents corpus, land the
curated train split in a snapshot-versioned table, tag the release.

The composition a pre-training data pipeline runs, as a user script:

1. run the curation funnel (quality gate → language filter → exact
   dedup → SimHash near-dup collapse → eval-split decontamination →
   train/val/test split) — `operators/dedup.curation_funnel_counts`
   is the oracle-gated form of the same chain;
2. materialize the surviving TRAIN documents into a warehouse table
   (create + append through the table layer);
3. tag the snapshot as a named release (`set_tag`) so expiry can never
   drop it and the exact released file set stays time-travelable.

Run: ``python examples/curation_pipeline.py``
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
        _gram_expr,
        _simhash_df,
        _token_arrays,
        curation_funnel_counts,
    )
    from iceberg_loader_spark.sources.tables import load_table

    spark = get_spark("example_curation_pipeline")
    warehouse_path = warehouse_path or tempfile.mkdtemp(prefix="wh_curation_")
    wh = Warehouse(warehouse_path)

    # 1. the funnel report (the oracle-gated query IS the pipeline audit)
    funnel = {
        r["stage"]: r["n_docs"]
        for r in curation_funnel_counts(spark, SF_DIR).collect()
    }
    logger.info("funnel: %s", funnel)

    # 2. rebuild the surviving train set with the same deterministic
    # rules and land it in a table (the funnel counts stages; this
    # materializes the final selection)
    docs = load_table(spark, SF_DIR, "documents")
    toks_n = F.size(
        F.filter(F.split(F.lower(F.col("text")), " "), lambda t: F.length(t) > 0)
    )
    survivors = docs.filter(
        F.col("n_chars").between(100, 10000)
        & (toks_n >= 20)
        & (F.col("lang") != "zh")
    )
    from pyspark.sql import Window as W

    exact = (
        survivors.withColumn(
            "rn", F.row_number().over(W.partitionBy(F.md5("text")).orderBy("doc_id"))
        )
        .filter("rn = 1")
        .drop("rn")
    )
    keepers = (
        _simhash_df(docs.join(exact.select("doc_id"), "doc_id"))
        .withColumn(
            "rn", F.row_number().over(W.partitionBy("simhash").orderBy("doc_id"))
        )
        .filter("rn = 1")
        .select("doc_id")
    )
    grams = (
        _token_arrays(docs)
        .filter(F.size("ts") >= 5)
        .select(
            "doc_id",
            F.explode(F.array_distinct(F.transform(_gram_expr(5), F.md5))).alias("g"),
        )
    )
    contam = (
        grams.filter(F.col("doc_id") % 10 != 0)
        .join(grams.filter(F.col("doc_id") % 10 == 0).select("g").distinct(), "g")
        .select("doc_id")
        .distinct()
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    train = (
        exact.join(keepers, "doc_id")
        .filter(F.col("doc_id") % 10 != 0)
        .join(contam, "doc_id", "left_anti")
        .filter(bucket < 98)
    )

    t = Table.create(wh, "curated.docs_train", train.schema)
    t.append(train)
    t = wh.load_table("curated.docs_train")
    snap = t.set_tag("release-v1")
    n_landed = t.scan(spark, tag="release-v1").count()
    logger.info(
        "landed %d train docs at version %d (tag release-v1)",
        n_landed,
        snap.version,
    )
    return {"funnel": funnel, "rows_landed": n_landed, "tag_version": snap.version}


if __name__ == "__main__":
    print(run_example())
