"""End-to-end corpus governance report: the release-gate sweep a data
team runs before publishing a curated corpus, as a user script.

1. privacy — k-anonymity audit over quasi-identifiers plus PII match
   counts from the redaction pass;
2. integrity — exact-dup rate (full corpus vs the 10% sample, with the
   sampling-bias error), Count-Min heavy-hitter verdicts, and the HLL
   sketch-rollup accuracy verdicts;
3. coverage — held-out vocabulary OOV rates per language;
4. land the one-row-per-source report in a warehouse table so every
   release gate is a time-travelable snapshot.

Every metric is an oracle-gated operator from the registry — the script
only composes them. Run: ``python examples/governance_report.py``
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
    from iceberg_loader_spark.operators.dedup import sample_dup_rate_estimate
    from iceberg_loader_spark.operators.relational import hll_sketch_rollup
    from iceberg_loader_spark.operators.text import (
        countmin_heavy_hitters,
        k_anonymity_audit,
        pii_redact_documents,
        vocab_oov_audit,
    )

    spark = get_spark("example_governance_report")
    warehouse_path = warehouse_path or tempfile.mkdtemp(prefix="wh_gov_")
    wh = Warehouse(warehouse_path)

    # 1. privacy
    anon = k_anonymity_audit(spark, SF_DIR)
    exposed = anon.agg(
        F.sum("exposed_docs").alias("exposed"),
        F.sum("n_docs").alias("total"),
    ).collect()[0]
    pii_hits = (
        pii_redact_documents(spark, SF_DIR)
        .agg(
            F.sum("n_emails").alias("emails"),
            F.sum("n_phones").alias("phones"),
            F.sum("n_ips").alias("ips"),
        )
        .collect()[0]
    )
    logger.info(
        "privacy: %d/%d docs in sub-k classes; PII emails=%d phones=%d ips=%d",
        exposed["exposed"], exposed["total"],
        pii_hits["emails"], pii_hits["phones"], pii_hits["ips"],
    )

    # 2. integrity — sketch verdicts must all hold before anyone trusts
    # the cheap (sketch) numbers at full scale
    dup = sample_dup_rate_estimate(spark, SF_DIR).collect()[0]
    cm_bad = (
        countmin_heavy_hitters(spark, SF_DIR)
        .filter(~F.col("overestimate_ok"))
        .count()
    )
    hll_bad = (
        hll_sketch_rollup(spark, SF_DIR)
        .filter(
            ~F.col("merged_within_5pct") | ~F.col("merge_agrees_within_2pct")
        )
        .count()
    )
    logger.info(
        "integrity: dup %d bps (sample err %d bps); CM violations=%d; "
        "HLL violations=%d",
        dup["exact_dup_bps"], dup["abs_err_bps"], cm_bad, hll_bad,
    )

    # 3. coverage
    oov = vocab_oov_audit(spark, SF_DIR)
    worst_oov = oov.agg(F.max("oov_rate_bps").alias("m")).collect()[0]["m"]

    # 4. land the per-source report (one snapshot per release gate)
    report = (
        anon.select(
            "lang",
            "source",
            "n_docs",
            "exposed_docs",
            F.col("k_anonymous").cast("int").alias("k_ok"),
        )
        .withColumn("run_id", F.lit("release-2026-01-01"))
    )
    t = Table.create(wh, "governance.release_gate", report.schema)
    t.append(report.coalesce(2))
    landed = wh.load_table("governance.release_gate").scan(spark).count()
    logger.info("landed %d report rows; worst OOV %d bps", landed, worst_oov)

    return {
        "exposed_docs": exposed["exposed"],
        "total_docs": exposed["total"],
        "exact_dup_bps": dup["exact_dup_bps"],
        "dup_sample_err_bps": dup["abs_err_bps"],
        "cm_violations": cm_bad,
        "hll_violations": hll_bad,
        "worst_oov_bps": worst_oov,
        "report_rows": landed,
    }


if __name__ == "__main__":
    out = run_example()
    print(out)
