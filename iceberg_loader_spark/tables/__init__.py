"""Snapshot-versioned parquet table layer ("snaptables").

A from-scratch, Spark-native re-expression of the Iceberg table semantics
the reference uses through PyIceberg (create / append / overwrite /
delete-filter / upsert, schema evolution, hidden partition transforms,
snapshot time travel, expiry, compaction) — built on plain parquet files
plus JSON snapshot manifests with an atomic-rename commit protocol, because
this environment has no Iceberg runtime jar.

Design parity map (reference = /root/reference, see SURVEY.md §2 Part A):

* one snapshot per commit           core/strategies.py:32,43,61
* optimistic commit w/ retry        core/config.py:15-17
* add-only schema evolution         core/schema.py:52-78
* partition transforms              core/partitioning.py:18-96
* keep-last / older-than expiry     services/maintenance.py:12-86

Scale design: manifests store per-file partition values and column
min/max stats, so planning is metadata-only (no file listing, no data
read); deletes/merges are copy-on-write at file granularity (untouched
files carry over by reference); reads hand Spark an explicit file list +
schema so Catalyst's parquet pushdown/pruning applies unchanged.
"""

from iceberg_loader_spark.tables.catalog import Warehouse
from iceberg_loader_spark.tables.format import (
    CommitConflict,
    ConcurrentModification,
    MetadataBackend,
    Snapshot,
    TableMetadata,
)

__all__ = [
    "Warehouse",
    "Snapshot",
    "TableMetadata",
    "MetadataBackend",
    "CommitConflict",
    "ConcurrentModification",
]
