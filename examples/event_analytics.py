"""End-to-end event-analytics pipeline: fold the raw event stream into
an SCD2 user-state table, then run the operational metric suite over it.

The composition a product-analytics stack runs nightly, as a user script:

1. fold the append-only event log into SCD2 validity intervals
   (`operators/timeseries.scd2_user_value_history` is the oracle-gated
   form) and land the CURRENT-state rows in a warehouse table;
2. compute the metric suite from the same log — trailing 7-day distinct
   users, CUSUM mean-shift flags per event type, U-shaped multi-touch
   revenue attribution, and the top user journeys;
3. append the per-channel attribution report to a metrics table so each
   nightly run is a snapshot (time-travelable report history).

Run: ``python examples/event_analytics.py``
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
    from iceberg_loader_spark.operators.timeseries import (
        attribution_u_shape,
        cusum_shift_detect,
        rolling_7d_distinct_users,
        scd2_user_value_history,
    )
    from iceberg_loader_spark.operators.graph import event_path_trigrams

    spark = get_spark("example_event_analytics")
    warehouse_path = warehouse_path or tempfile.mkdtemp(prefix="wh_events_")
    wh = Warehouse(warehouse_path)

    # 1. SCD2 fold → current-state dimension table
    hist = scd2_user_value_history(spark, SF_DIR)
    current = hist.filter(F.col("is_current") == 1).select(
        "user_id", "state", "value_cents", "valid_from"
    )
    dim = Table.create(wh, "analytics.user_current_state", current.schema)
    dim.append(current.coalesce(2))
    n_current = wh.load_table("analytics.user_current_state").scan(
        spark
    ).count()
    logger.info("current-state rows: %d", n_current)

    # 2. the metric suite (each one an oracle-gated operator)
    dau_tail = (
        rolling_7d_distinct_users(spark, SF_DIR)
        .orderBy(F.desc("day_idx"))
        .limit(1)
        .collect()[0]
    )
    shifts = (
        cusum_shift_detect(spark, SF_DIR)
        .filter(F.col("shift_flag") == 1)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_flagged_hours"))
        .collect()
    )
    top_paths = event_path_trigrams(spark, SF_DIR).limit(3).collect()
    logger.info(
        "latest DAU-7 %d; flagged hours %s; top path %s",
        dau_tail["dau7"],
        {r["event_type"]: r["n_flagged_hours"] for r in shifts},
        top_paths[0]["path"] if top_paths else None,
    )

    # 3. attribution report → append-per-run metrics table
    report = attribution_u_shape(spark, SF_DIR).withColumn(
        "run_date", F.lit("2026-01-01")
    )
    metrics = Table.create(wh, "analytics.attribution_runs", report.schema)
    metrics.append(report.coalesce(1))
    credit = {
        r["channel"]: r["credit_cents"]
        for r in wh.load_table("analytics.attribution_runs")
        .scan(spark)
        .collect()
    }
    logger.info("attributed cents by channel: %s", credit)

    return {
        "current_state_rows": n_current,
        "latest_dau7": dau_tail["dau7"],
        "shift_flagged_types": len(shifts),
        "channels_credited": len(credit),
        "top_paths": len(top_paths),
    }


if __name__ == "__main__":
    out = run_example()
    logger.info("done: %s", out)
