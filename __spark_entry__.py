"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented SURVEY.md §2 operator, keyed by name.
``oracle_sql()`` — DuckDB twins with identical output column names.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the end-to-end curation funnel (quality gate -> language
    filter -> exact dedup -> SimHash near-dup collapse -> eval-split
    decontamination -> train/val/test split) on /root/testdata/sf0.001 —
    per-stage survivor counts, the report a pre-training data pipeline
    watches."""
    from iceberg_loader_spark.operators import all_queries

    return all_queries()["curation_funnel_counts"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from iceberg_loader_spark.operators import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from iceberg_loader_spark.operators import all_oracles

    return all_oracles()
