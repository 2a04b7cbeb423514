"""Snapshot tags (Iceberg tag refs): named time travel + retention pins."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables.maintenance import expire_snapshots
from iceberg_loader_spark.tables.table import Table
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang"
    )


def test_tag_scan_and_listing(spark, tmp_path):
    docs = _docs(spark)
    t = Table.create(Warehouse(str(tmp_path / "wh")), "db.t", docs.schema)
    t.append(docs.filter(F.col("doc_id") % 2 == 0))
    n_even = t.scan(spark).count()
    t.set_tag("v1.0")  # defaults to current snapshot
    t.append(docs.filter(F.col("doc_id") % 2 == 1))

    assert t.tags() == {"v1.0": 2}
    assert t.scan(spark, tag="v1.0").count() == n_even
    assert t.scan(spark).count() == docs.count()

    with pytest.raises(ValueError):
        t.scan(spark, tag="v1.0", version=1)
    with pytest.raises(KeyError):
        t.resolve_tag("nope")

    t.remove_tag("v1.0")
    assert t.tags() == {}


def test_tag_protects_from_expiry(spark, tmp_path):
    docs = _docs(spark)
    t = Table.create(Warehouse(str(tmp_path / "wh")), "db.t", docs.schema)
    t.append(docs.limit(10))
    t.set_tag("release")
    tagged_v = t.resolve_tag("release")
    for _ in range(5):
        t.append(docs.limit(5))

    res = expire_snapshots(t, keep_last=1)
    assert res["expired"] > 0
    # the tagged snapshot survived and still scans
    assert t.scan(spark, tag="release").count() == 10
    # everything older and untagged is gone
    surviving = {s.version for s in t.history()}
    assert tagged_v in surviving


def test_set_ref_is_row_preserving_for_incremental_and_cdc(spark, tmp_path):
    docs = _docs(spark)
    t = Table.create(Warehouse(str(tmp_path / "wh")), "db.t", docs.schema)
    t.append(docs.filter(F.col("doc_id") % 2 == 0))
    base = t.meta.current_version()
    t.set_tag("mid")
    t.append(docs.filter(F.col("doc_id") % 2 == 1))
    n_odd = docs.filter(F.col("doc_id") % 2 == 1).count()
    # the set-ref commit in the range is skipped, not an error
    assert t.scan_incremental(spark, base).count() == n_odd
    ch = t.changes(spark, base)
    assert ch.filter(F.col("_change_type") == "insert").count() == n_odd


def test_tag_invalid_names_rejected(spark, tmp_path):
    docs = _docs(spark)
    t = Table.create(Warehouse(str(tmp_path / "wh")), "db.t", docs.schema)
    t.append(docs.limit(1))
    for bad in ("", " x", "a/b"):
        with pytest.raises(ValueError):
            t.set_tag(bad)
    with pytest.raises(KeyError):
        t.remove_tag("absent")
