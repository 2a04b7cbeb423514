"""Warehouse catalog: maps ``namespace.table`` identifiers to table roots.

The reference talks to a Hive-metastore/PyIceberg catalog
(``/root/reference src/iceberg_loader/core/loader.py:20-31``); here the
catalog is a warehouse directory — the same role Spark's ``hadoop``
Iceberg catalog plays for local/dev stacks. All state lives in the table
directories themselves (see format.py), so the catalog is stateless and
cheap.
"""

from __future__ import annotations

import os
import shutil

from iceberg_loader_spark.tables.format import TableMetadata


class Warehouse:
    def __init__(self, path: str, backend_factory=None):
        """``backend_factory(table_root) -> MetadataBackend`` selects the
        metadata storage implementation per table (default: local POSIX;
        pass an :class:`~iceberg_loader_spark.tables.objectstore
        .ObjectStoreBackend` factory for S3-semantics metadata)."""
        self.path = path
        self.backend_factory = backend_factory
        os.makedirs(path, exist_ok=True)

    def table_root(self, identifier: str) -> str:
        parts = identifier.split(".")
        if not all(p and "/" not in p for p in parts):
            raise ValueError(f"invalid table identifier: {identifier!r}")
        return os.path.join(self.path, *parts)

    def metadata(self, identifier: str) -> TableMetadata:
        root = self.table_root(identifier)
        backend = self.backend_factory(root) if self.backend_factory else None
        return TableMetadata(root, backend=backend)

    def table_exists(self, identifier: str) -> bool:
        return self.metadata(identifier).exists()

    def load_table(self, identifier: str):
        from iceberg_loader_spark.tables.table import Table

        meta = self.metadata(identifier)
        if not meta.exists():
            raise FileNotFoundError(f"table {identifier} does not exist")
        return Table(self, identifier)

    def drop_table(self, identifier: str) -> None:
        # drop metadata through the backend (on an object store the local
        # rmtree alone would leave the manifests — and the table — alive)
        self.metadata(identifier).backend.drop()
        root = self.table_root(identifier)
        if os.path.isdir(root):
            shutil.rmtree(root)

    def list_tables(self, namespace: str) -> list[str]:
        ns_dir = os.path.join(self.path, *namespace.split("."))
        if not os.path.isdir(ns_dir):
            return []
        out = []
        for name in sorted(os.listdir(ns_dir)):
            if self.metadata(f"{namespace}.{name}").exists():
                out.append(f"{namespace}.{name}")
        return out
