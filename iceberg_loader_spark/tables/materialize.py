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

import logging
import os
from collections.abc import Callable

from pyspark.sql import DataFrame

__all__ = ["materialize", "release_blocks"]

_LOG = logging.getLogger(__name__)
_RELEASE_WARNED = False


def release_blocks(df: DataFrame) -> bool:
    """Free the executor blocks backing a materialized frame, NOW.

    Caller contract: every consumer of the frame has already evaluated —
    a ``localCheckpoint`` frame's lineage is truncated, so a read after
    release fails loudly (``CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND``), while a
    ``persist``-mode frame silently recomputes from lineage.

    Returns ``True`` if blocks were freed. Failure is logged (once per
    process) rather than swallowed: a silent no-op here would accumulate
    block storage in exactly the long-lived many-changelog scenario this
    helper exists to bound.
    """
    global _RELEASE_WARNED
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            # localCheckpoint frame: the persisted RDD lives inside the
            # LogicalRDD node (the DataFrame itself is not "cached" as
            # far as the CacheManager knows, so df.unpersist is a no-op)
            plan.rdd().unpersist(False)
        else:
            # persist-mode frame: the plan is the original tree and the
            # CacheManager owns the blocks
            df.unpersist(False)
        return True
    except Exception:
        if not _RELEASE_WARNED:
            _LOG.warning(
                "release_blocks: could not free materialized blocks — "
                "block storage will rely on GC/ContextCleaner until the "
                "session ends (reported once per process)",
                exc_info=True,
            )
            _RELEASE_WARNED = True
        return False


def materialize(df: DataFrame) -> tuple[DataFrame, Callable[[], None]]:
    if os.environ.get("SPARK_GRAFT_MATERIALIZE") == "persist":
        from pyspark.storagelevel import StorageLevel

        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()  # eager, so every consumer reads the cache
        return out, lambda: release_blocks(out)

    out = df.localCheckpoint(eager=True)
    return out, lambda: release_blocks(out)
