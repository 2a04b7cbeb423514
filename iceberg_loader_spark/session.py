"""SparkSession factory for the engine.

Semantics-parity knobs (see SURVEY.md §7.1):

* ``spark.sql.ansi.enabled=false`` — the reference NULLs failed casts
  (``/root/reference src/iceberg_loader/utils/arrow.py:75-102``); non-ANSI
  Spark casts match that per-value.
* UTC session timezone — reference timestamps are µs tz-naive / UTC
  (``utils/types.py:52``); DuckDB oracle timestamps are UTC-naive.
* AQE on — runtime join-strategy switching + skew handling is part of the
  100 TB design (the local[32] test box still benefits from partition
  coalescing).

At cluster scale the same builder works with ``master`` pointing at YARN/K8s;
nothing here is local-mode-specific except the defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "iceberg_loader_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster pass ``master=None`` and set it via spark-submit.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # -- parallelism: ~cores locally; on a cluster this is sized to
        #    total executor cores (AQE coalesces down when partitions are small)
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE re-coalesce the output partitioning of persisted frames
        # (merge's CoW join, dedup's materialized signature frames) — off
        # by default, which leaves cached plans at raw shuffle.partitions
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        # -- semantics parity
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # parquet TIMESTAMP(NANOS) (events.ts) is otherwise unreadable by
        # Spark; read as raw ns-longs and convert in sources/tables.py
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # -- python exchange is Arrow-batched everywhere
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # -- let the sparkberg Python DataSource push filters for
        #    manifest-stat file pruning (sources/spark_datasource.py)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # -- local-mode memory (driver == only JVM in local mode)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # v2 commit: per-task rename instead of sequential job-commit rename
        # — matters for high-partition-count writes (many small files)
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2"
        )
        # RocksDB state store: streaming state (session windows, stateful
        # dedup) spills to local disk instead of growing the JVM heap —
        # required posture for 100 TB streaming state, harmless locally
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
