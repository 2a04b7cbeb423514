"""Positional delete files (Iceberg v2's second merge-on-read delete
shape): DELETE WHERE evaluated once at delete time, matching rows'
(file_path, pos) pairs recorded in a delete file, scans anti-join on row
lineage. Pins: visibility, sequence exclusion, referenced-file pruning,
time travel, compaction materialization, CDC emission, and the
concurrent-rewrite abort."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables.maintenance import rewrite_data_files
from iceberg_loader_spark.tables.table import ConcurrentModification, Table, _op_applies
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )


def _fresh(spark, tmp_path, name="db.posdel"):
    docs = _docs(spark)
    t = Table.create(Warehouse(str(tmp_path / "wh")), name, docs.schema)
    # two files so lineage spans multiple physical files
    t.append(docs.filter(F.col("doc_id") % 2 == 0).coalesce(1))
    t.append(docs.filter(F.col("doc_id") % 2 == 1).coalesce(1))
    return t, docs


def test_pos_delete_hides_rows_without_rewriting(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    files_before = {f.path for f in t.snapshot().files}
    n_total = docs.count()
    n_de = docs.filter(F.col("lang") == "de").count()
    assert n_de > 0

    t.delete_where(spark, "lang == 'de'", mode="mor-pos")

    snap = t.snapshot()
    assert {f.path for f in snap.files} == files_before  # zero rewrite
    assert len(snap.delete_files) == 1
    op = snap.delete_files[0]
    assert op["kind"] == "pos"
    assert op["rows"] == n_de
    assert "paths" in op
    assert t.scan(spark).count() == n_total - n_de
    assert t.scan(spark).filter(F.col("lang") == "de").count() == 0


def test_pos_delete_sequence_excludes_later_appends(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    t.delete_where(spark, "lang == 'de'", mode="mor-pos")
    survivors = t.scan(spark).count()

    late = docs.filter(F.col("lang") == "de").limit(10)
    n_late = late.count()
    t.append(late)
    # appended rows match the predicate but positions never cover them
    assert t.scan(spark).count() == survivors + n_late
    assert t.scan(spark).filter(F.col("lang") == "de").count() == n_late


def test_pos_delete_prunes_unreferenced_files(spark, tmp_path):
    docs = _docs(spark)
    t = Table.create(Warehouse(str(tmp_path / "wh")), "db.pruned", docs.schema)
    # files split BY LANG: stats prove the non-de file can't match, so the
    # delete references only the de file
    t.append(docs.filter(F.col("lang") == "de").coalesce(1))
    t.append(docs.filter(F.col("lang") == "en").coalesce(1))
    # threshold strictly inside the de file's n_chars range: the de file
    # is a PARTIAL match (positions recorded, not a full-file drop); the
    # en file is provably clean from its lang stats and must be pruned
    de_file0 = next(
        f for f in t.snapshot().files if f.stats["lang"][0] == "de"
    )
    lo, hi = de_file0.stats["n_chars"]
    assert lo < hi
    mid = (lo + hi) // 2
    t.delete_where(
        spark, f"lang == 'de' and n_chars <= {mid}", mode="mor-pos"
    )

    snap = t.snapshot()
    op = dict(snap.delete_files[0])
    op["kind"] = "pos"
    de_file = next(f for f in snap.files if f.stats["lang"][0] == "de")
    en_file = next(f for f in snap.files if f.stats["lang"][0] == "en")
    assert op["paths"] == [de_file.path]
    assert _op_applies(de_file, op) is True
    assert _op_applies(en_file, op) is False
    assert (
        t.scan(spark)
        .filter((F.col("lang") == "de") & (F.col("n_chars") <= mid))
        .count()
        == 0
    )
    assert (
        t.scan(spark)
        .filter((F.col("lang") == "de") & (F.col("n_chars") > mid))
        .count()
        > 0
    )


def test_pos_delete_time_travel_and_double_delete(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    v0 = t.snapshot().version
    n_total = docs.count()
    t.delete_where(spark, "lang == 'de'", mode="mor-pos")
    # second identical delete: idempotent (covered rows already hidden;
    # duplicate positions are a no-op in the anti-join)
    t.delete_where(spark, "lang == 'de'", mode="mor-pos")
    n_de = docs.filter(F.col("lang") == "de").count()
    assert t.scan(spark).count() == n_total - n_de
    assert t.scan(spark, version=v0).count() == n_total


def test_pos_delete_compaction_materializes(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    t.delete_where(spark, "lang == 'de'", mode="mor-pos")
    expected = t.scan(spark).count()
    rewrite_data_files(t, spark)
    snap = t.snapshot()
    assert snap.delete_files == []
    assert t.scan(spark).count() == expected
    assert t.scan(spark).filter(F.col("lang") == "de").count() == 0


def test_pos_delete_mixes_with_equality_and_bloom(spark, tmp_path):
    docs = _docs(spark)
    t = Table.create(
        Warehouse(str(tmp_path / "wh")),
        "db.mixed",
        docs.schema,
        properties={"write.bloom.keys": "doc_id"},
    )
    t.append(docs.filter(F.col("doc_id") % 2 == 0).coalesce(1))
    t.append(docs.filter(F.col("doc_id") % 2 == 1).coalesce(1))
    n_total = docs.count()

    t.delete_where(spark, "lang == 'de'", mode="mor-pos")
    keys = spark.createDataFrame([(1,), (3,), (5,)], "doc_id long")
    t.delete_by_keys(spark, keys, ["doc_id"])

    survivors = docs.filter(
        (F.col("lang") != "de") & (~F.col("doc_id").isin(1, 3, 5))
    )
    assert t.scan(spark).count() == survivors.count()
    got = {r["doc_id"] for r in t.scan(spark).collect()}
    want = {r["doc_id"] for r in survivors.collect()}
    assert got == want
    assert n_total > survivors.count()


def test_pos_delete_cdc_emits_delete_rows(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    v0 = t.snapshot().version
    t.delete_where(spark, "lang == 'de'", mode="mor-pos")
    v1 = t.snapshot().version
    ch = t.changes(spark, v0, v1)
    dels = ch.filter(F.col("_change_type") == "delete")
    assert dels.count() == docs.filter(F.col("lang") == "de").count()
    assert (
        dels.filter(F.col("lang") != "de").count() == 0
    )


def test_pos_delete_aborts_on_concurrent_rewrite(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    stale = t.snapshot()

    orig = Table.snapshot
    state = {"first": True}

    def stale_once(self, version=None):
        if state["first"] and version is None:
            state["first"] = False
            return stale
        return orig(self, version)

    # the delete plans against the pre-compaction snapshot; the commit
    # must detect the rewritten candidates and abort
    rewrite_data_files(t, spark)
    Table.snapshot = stale_once
    try:
        with pytest.raises(ConcurrentModification):
            t.delete_where(spark, "lang == 'de'", mode="mor-pos")
    finally:
        Table.snapshot = orig
    # table unharmed
    assert t.scan(spark).count() == docs.count()
