"""Shared materialize-and-truncate helper for the table layer.

``materialize(df)`` computes ``df`` once and returns ``(frame, release)``
where ``frame`` is safe to consume from multiple downstream actions and
``release()`` frees the backing blocks deterministically (no waiting on
GC/ContextCleaner — a long-lived session applying many changelogs must
not accumulate block storage).

Two modes, same switch as ``operators/dedup._materialize``:

* default — ``localCheckpoint``: lineage is CUT, so downstream task
  binaries ship "read these blocks" instead of the full upstream plan
  (a compounded changelog plan has OOM'd a default-1g heap via multi-MiB
  nested-closure task binaries). Blocks are executor-local; an executor
  death loses them without recompute — acceptable single-node, and the
  failure is loud.
* ``SPARK_GRAFT_MATERIALIZE=persist`` — MEMORY_AND_DISK with lineage
  kept: the cluster-safe spelling (lost blocks recompute), for
  deployments whose executors have real heaps.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame

__all__ = ["materialize"]


def materialize(df: DataFrame) -> tuple[DataFrame, Callable[[], None]]:
    if os.environ.get("SPARK_GRAFT_MATERIALIZE") == "persist":
        from pyspark.storagelevel import StorageLevel

        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()  # eager, so every consumer reads the cache
        return out, lambda: out.unpersist()

    out = df.localCheckpoint(eager=True)

    def release() -> None:
        # the checkpointed RDD lives inside the LogicalRDD node; freeing
        # it here instead of waiting on the py4j finalizer bounds block
        # storage across repeated calls
        try:
            out._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:  # pragma: no cover - best-effort release
            pass

    return out, release
