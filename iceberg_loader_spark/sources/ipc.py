"""Distributed Arrow IPC ingestion (SURVEY.md §2 A3 — the scale path).

The reference reads one IPC stream on a single process
(/root/reference src/iceberg_loader/core/loader.py:56-68); the loader's
``load_ipc_stream`` mirrors that for driver-side sources (paths, sockets,
file objects). This module is the cluster form: a *directory* of IPC
files is read through Spark's ``binaryFile`` source, and each file's
batches are decoded executor-side inside ``mapInArrow`` — ingestion
bandwidth scales with the number of files × executors, and no payload
byte ever passes through the driver.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from iceberg_loader_spark.types import arrow_schema_to_spark


def _peek_schema(path: str) -> pa.Schema:
    with open(path, "rb") as f:
        return pa.ipc.open_stream(f).schema


def read_ipc_dir(spark: SparkSession, directory: str) -> DataFrame:
    """All Arrow IPC stream files under ``directory`` as one DataFrame.

    Schema is taken from the first file (reference semantics: schema from
    the first batch) and every file must match it — mismatches surface as
    decode errors on the executor, not silent coercion.
    """
    files = sorted(glob.glob(os.path.join(directory, "*.arrow")))
    if not files:
        raise ValueError(f"no .arrow IPC files under {directory}")
    arrow_schema = _peek_schema(files[0])
    spark_schema = arrow_schema_to_spark(arrow_schema)

    def decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # input rows: (path, modificationTime, length, content)
        for b in batches:
            tbl = pa.Table.from_batches([b])
            for content in tbl.column("content").to_pylist():
                reader = pa.ipc.open_stream(content)
                for out in reader:
                    yield out

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.arrow")
        .load(directory)
        .select("path", "content")
    )
    return raw.mapInArrow(decode, schema=spark_schema)
