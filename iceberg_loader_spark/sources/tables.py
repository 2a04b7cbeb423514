"""Readers for the driver testdata tables (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. All reads go
through :func:`load_table` so per-table physical quirks are fixed exactly
once:

* ``events.ts`` is parquet ``TIMESTAMP(NANOS)`` — Spark cannot scan NANOS
  natively, so the session reads it as a raw ns ``bigint``
  (``spark.sql.legacy.parquet.nanosAsLong``) and this module converts it to
  ``timestamp_ntz`` at µs precision (truncating division by 1000 — the same
  truncation DuckDB applies when it reads the file, so oracle comparisons
  line up).

Scale note: this is a plain parquet scan — Catalyst pushes filters and
prunes columns through it; the ns→µs conversion is a codegen'd projection,
so the 100 TB path is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Runtime-settable confs the engine depends on, applied defensively because
# callers (the verify driver included) may hand us a vanilla SparkSession:
# Spark 4 defaults to ANSI mode, but reference semantics are cast-fails→NULL
# (/root/reference src/iceberg_loader/utils/arrow.py:75-102), and parquet
# TIMESTAMP(NANOS) columns are unreadable without nanosAsLong.
_COMPAT_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_compat(spark: SparkSession) -> None:
    """Idempotently apply the engine's session-level compat confs."""
    for k, v in _COMPAT_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:  # pragma: no cover - non-settable conf on this build
            pass


TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, applying physical-type fixups.

    The analyzed DataFrame is memoized per (session, sf_dir, name): the
    testdata directories are immutable, so re-running ``spark.read.parquet``
    (file listing + footer schema read, ~70 ms of driver-side latency per
    call) for every operator invocation is pure fixed cost. A DataFrame is
    an immutable logical plan — reuse is free and the cache dies with the
    session object. Mutable paths (warehouse tables) never go through this
    reader; they use :class:`~iceberg_loader_spark.tables.Warehouse`.

    Immutability is *verified*, not assumed: the cached plan pins a
    fingerprint of the path's file listing — every file's (relative name,
    size, mtime) — at first read, so a hit is honored only while that set
    is unchanged. This catches in-place rewrites of an existing part file
    and changes inside nested partition subdirectories, which a bare
    directory-mtime check would miss (POSIX directory mtime only moves
    when a DIRECT child is created/removed/renamed).
    """
    ensure_compat(spark)
    cache = getattr(spark, "_ils_table_cache", None)
    if cache is None:
        cache = {}
        try:
            spark._ils_table_cache = cache
        except AttributeError:  # pragma: no cover - slotted session impl
            pass
    path = f"{sf_dir}/{name}.parquet"
    fingerprint = _path_fingerprint(path)
    key = (sf_dir, name)
    cached = cache.get(key)
    if cached is not None and cached[0] == fingerprint:
        return cached[1]
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns epoch → µs-precision naive timestamp (matches DuckDB's read).
        # Built via timestampadd on an NTZ literal so the result is
        # independent of the session timezone.
        # NB: integer `div`, not `/` — ns epochs exceed double's 2^53
        # integer range, so floating division would corrupt the low µs
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    cache[key] = (fingerprint, df)
    return df


def _path_fingerprint(path: str):
    """Stat-level fingerprint of a local parquet path: for a directory,
    the sorted tuple of every contained file's (relpath, size, mtime_ns);
    for a single file, its (size, mtime_ns). ``None`` for non-local paths
    (e.g. ``s3a://``) — those cannot be verified and are trusted.
    Testdata directories hold a handful of part files, so the walk is a
    few stat calls — still ~10× cheaper than re-reading parquet footers."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    if not os.path.isdir(path):
        return (st.st_size, st.st_mtime_ns)
    entries = []
    for dirpath, _dirnames, filenames in os.walk(path):
        for fn in filenames:
            p = os.path.join(dirpath, fn)
            try:
                fst = os.stat(p)
            except OSError:
                continue  # raced with a writer; listing differs next call
            entries.append(
                (os.path.relpath(p, path), fst.st_size, fst.st_mtime_ns)
            )
    return tuple(sorted(entries))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for the SQL API)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
