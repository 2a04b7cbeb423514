"""Secondary value index: key → data-file mapping held as a warehouse
table (Hudi metadata-table / record-index shape).

A point lookup on a non-partition key normally reads every file of a
table whose per-file key ranges overlap (interleaved layouts defeat
min/max zone maps). The index table turns that into: one index probe →
the matched file list → a scan of only those files. Because the index is
itself a snapshot-versioned table it gets time travel, atomic commits,
and INCREMENTAL maintenance for free: after an append, only the new
files are indexed (``update_value_index`` reads the delta scan, never
the table).

Scale: ``build_value_index`` is one distinct shuffle of (key, file) over
the table — O(data) once; each ``update_value_index`` is O(new files);
each ``probe_files`` is O(index bucket). At 100 TB this is the
difference between a full-table scan and reading a handful of files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_loader_spark.tables.catalog import Warehouse
from iceberg_loader_spark.tables.table import Table

__all__ = ["build_value_index", "update_value_index", "probe_files"]


def _index_rows(df: DataFrame, key_col: str) -> DataFrame:
    return df.select(
        F.col(key_col), F.input_file_name().alias("file_uri")
    ).distinct()


def _reject_mor(t: Table, action: str) -> None:
    """The index maps keys to RAW parquet files and probe consumers read
    those files directly — pending merge-on-read state would (a) make
    ``input_file_name()`` unreliable under the scan's anti-join and
    (b) resurrect MoR-deleted rows at probe time. Require compaction
    (which materializes the deletes) before indexing."""
    snap = t.snapshot()
    if snap.delete_predicates or snap.delete_files:
        raise ValueError(
            f"cannot {action} value index on {t.identifier!r}: table has "
            "pending merge-on-read deletes; run compaction first"
        )


def build_value_index(
    spark: SparkSession, wh: Warehouse, table_name: str, index_name: str,
    key_col: str,
) -> Table:
    """Create the index table and bulk-index the current snapshot."""
    t = wh.load_table(table_name)
    _reject_mor(t, "build")
    rows = _index_rows(t.scan(spark), key_col)
    idx = Table.create(wh, index_name, rows.schema)
    idx.append(rows)
    return wh.load_table(index_name)


def update_value_index(
    spark: SparkSession, wh: Warehouse, table_name: str, index_name: str,
    key_col: str, from_version: int,
) -> Table:
    """Index only the files appended after ``from_version`` (delta scan —
    the existing table is never re-read)."""
    t = wh.load_table(table_name)
    _reject_mor(t, "update")
    rows = _index_rows(t.scan_incremental(spark, from_version), key_col)
    wh.load_table(index_name).append(rows)
    return wh.load_table(index_name)


def probe_files(
    spark: SparkSession, wh: Warehouse, index_name: str, key_col: str,
    keys: list,
) -> list[str]:
    """File URIs containing any of ``keys`` (sorted, deduplicated).

    The key list is a point-lookup set — small by contract — so the
    filter broadcasts as a literal IN and the collect returns file
    paths, not rows.
    """
    hits = (
        wh.load_table(index_name)
        .scan(spark)
        .filter(F.col(key_col).isin(keys))
        .select("file_uri")
        .distinct()
        .collect()
    )
    return sorted(r["file_uri"] for r in hits)
