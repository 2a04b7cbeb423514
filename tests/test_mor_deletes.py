"""Merge-on-read DELETE semantics (Iceberg v2 delete-file shape):
predicate recorded as O(1) metadata, applied at scan by data sequence
number, materialized by compaction."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables.maintenance import rewrite_data_files
from iceberg_loader_spark.tables.table import Table
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )


def _fresh(spark, tmp_path, name="db.mor"):
    docs = _docs(spark)
    t = Table.create(Warehouse(str(tmp_path / "wh")), name, docs.schema)
    t.append(docs)
    return t, docs


def test_mor_delete_hides_rows_without_rewriting(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    files_before = {f.path for f in t.snapshot().files}
    n_total = docs.count()
    n_de = docs.filter(F.col("lang") == "de").count()
    assert n_de > 0

    t.delete_where(spark, "lang == 'de'", mode="mor")

    snap = t.snapshot()
    # zero data rewritten: the file set is byte-identical
    assert {f.path for f in snap.files} == files_before
    assert snap.delete_predicates == [
        {"where": "lang == 'de'", "sequence": snap.version}
    ]
    assert t.scan(spark).count() == n_total - n_de
    assert t.scan(spark).filter(F.col("lang") == "de").count() == 0


def test_mor_sequence_excludes_later_appends(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    t.delete_where(spark, "lang == 'de'", mode="mor")
    survivors = t.scan(spark).count()

    # rows appended AFTER the delete match the predicate but must survive
    late = docs.filter(F.col("lang") == "de").limit(10)
    n_late = late.count()
    t.append(late)
    assert t.scan(spark).count() == survivors + n_late
    assert (
        t.scan(spark).filter(F.col("lang") == "de").count() == n_late
    )


def test_mor_time_travel_sees_pre_delete_rows(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    v_before = t.meta.current_version()
    t.delete_where(spark, "lang == 'de'", mode="mor")
    assert t.scan(spark, version=v_before).count() == docs.count()


def test_compaction_materializes_mor_deletes(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    t.delete_where(spark, "lang == 'de'", mode="mor")
    visible = t.scan(spark).count()

    rewrite_data_files(t, spark, target_files=2)

    snap = t.snapshot()
    assert snap.delete_predicates == []
    assert snap.total_rows == visible  # physically gone now
    assert t.scan(spark).count() == visible
    assert t.scan(spark).filter(F.col("lang") == "de").count() == 0


def test_merge_does_not_resurrect_mor_deleted_rows(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    t.delete_where(spark, "lang == 'de'", mode="mor")
    visible = t.scan(spark).count()

    # upsert touches an 'en' row -> rewrites a file that also holds
    # hidden 'de' rows; those must stay hidden
    src = (
        docs.filter(F.col("lang") == "en")
        .limit(1)
        .withColumn("n_chars", F.lit(999).cast("long"))
    )
    t.merge(spark, src, ["doc_id"])
    assert t.scan(spark).count() == visible
    assert t.scan(spark).filter(F.col("lang") == "de").count() == 0
    assert (
        t.scan(spark).filter(F.col("n_chars") == 999).count() == 1
    )


def test_cow_delete_after_mor_applies_both(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    t.delete_where(spark, "lang == 'de'", mode="mor")
    n_es = docs.filter(F.col("lang") == "es").count()
    visible = t.scan(spark).count()

    t.delete_where(spark, "lang == 'es'")  # cow rewrite over mor-hidden rows

    assert t.scan(spark).count() == visible - n_es
    assert t.scan(spark).filter(F.col("lang").isin("de", "es")).count() == 0


def test_changes_emits_mor_deletes(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    base = t.meta.current_version()
    n_de = docs.filter(F.col("lang") == "de").count()
    t.delete_where(spark, "lang == 'de'", mode="mor")

    ch = t.changes(spark, base).collect()
    assert len(ch) == n_de
    assert all(r["_change_type"] == "delete" for r in ch)
    assert all(r["lang"] == "de" for r in ch)


def test_rollback_restores_predicates(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    v_with_all = t.meta.current_version()
    t.delete_where(spark, "lang == 'de'", mode="mor")
    visible_after_delete = t.scan(spark).count()

    t.rollback(v_with_all)
    assert t.snapshot().delete_predicates == []
    assert t.scan(spark).count() == docs.count()

    # and rolling forward again restores the delete view
    t.rollback(v_with_all + 1)
    assert len(t.snapshot().delete_predicates) == 1
    assert t.scan(spark).count() == visible_after_delete


def test_mor_delete_drops_fully_matching_files(spark, tmp_path):
    """Partition-aligned MoR delete: metadata-proof full-match files are
    dropped outright at commit, so the common prune case stays free at
    scan time too."""
    docs = _docs(spark)
    from iceberg_loader_spark.tables.partitioning import PartitionField

    t = Table.create(
        Warehouse(str(tmp_path / "wh2")),
        "db.morp",
        docs.schema,
        partition_spec=[PartitionField("identity", "lang", "lang")],
    )
    t.append(docs)
    n_files_before = len(t.snapshot().files)
    t.delete_where(spark, "lang == 'de'", mode="mor")
    snap = t.snapshot()
    assert len(snap.files) < n_files_before  # de partition files dropped
    assert t.scan(spark).filter(F.col("lang") == "de").count() == 0


# --------------------------------------------------------------------------
# Equality-delete files: merge(mode='mor') — the write-optimized upsert.
# --------------------------------------------------------------------------


def test_mor_merge_upserts_without_reading_target(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    files_before = {f.path for f in t.snapshot().files}
    n_total = docs.count()

    src = (
        docs.limit(5)
        .withColumn("n_chars", F.lit(12345).cast("long"))
        .unionByName(
            spark.createDataFrame([(-1, "xx", 7)], docs.schema)
        )
    )
    t.merge(spark, src, ["doc_id"], mode="mor")

    snap = t.snapshot()
    # old files untouched, new files appended, one equality delete listed
    assert files_before <= {f.path for f in snap.files}
    assert len(snap.delete_files) >= 1
    assert snap.delete_files[0]["equality_cols"] == ["doc_id"]

    out = t.scan(spark)
    assert out.count() == n_total + 1  # 5 updates + 1 insert
    assert out.filter(F.col("n_chars") == 12345).count() == 5
    assert out.filter(F.col("doc_id") == -1).count() == 1
    # exactly one version of each updated key survives
    assert (
        out.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    )


def test_mor_merge_sequence_excludes_later_appends(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    src = docs.limit(3).withColumn("n_chars", F.lit(1).cast("long"))
    t.merge(spark, src, ["doc_id"], mode="mor")
    # append the SAME keys after the merge: higher sequence -> visible,
    # giving duplicates (append is not an upsert) — proves the equality
    # delete does not leak forward
    t.append(docs.limit(3))
    out = t.scan(spark)
    dup_keys = out.groupBy("doc_id").count().filter(F.col("count") > 1)
    assert dup_keys.count() == 3


def test_mor_merge_duplicate_source_keys_raise(spark, tmp_path):
    import pytest

    t, docs = _fresh(spark, tmp_path)
    dup_src = docs.limit(2).unionByName(docs.limit(2))
    with pytest.raises(ValueError, match="duplicate join keys"):
        t.merge(spark, dup_src, ["doc_id"], mode="mor")


def test_compaction_materializes_equality_deletes(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    n_total = docs.count()
    src = docs.limit(4).withColumn("n_chars", F.lit(999777).cast("long"))
    t.merge(spark, src, ["doc_id"], mode="mor")
    visible = t.scan(spark).count()
    assert visible == n_total

    rewrite_data_files(t, spark, target_files=2)
    snap = t.snapshot()
    assert snap.delete_files == []
    assert snap.total_rows == n_total  # old key versions physically gone
    assert t.scan(spark).filter(F.col("n_chars") == 999777).count() == 4


def test_changes_emits_update_as_delete_plus_insert_for_mor_merge(
    spark, tmp_path
):
    t, docs = _fresh(spark, tmp_path)
    base = t.meta.current_version()
    src = docs.limit(2).withColumn("n_chars", F.lit(9).cast("long"))
    t.merge(spark, src, ["doc_id"], mode="mor")

    ch = t.changes(spark, base)
    dels = ch.filter(F.col("_change_type") == "delete")
    ins = ch.filter(F.col("_change_type") == "insert")
    assert dels.count() == 2  # the superseded row versions
    assert ins.count() == 2
    assert ins.filter(F.col("n_chars") == 9).count() == 2


def test_mor_merge_time_travel(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    v_before = t.meta.current_version()
    src = docs.limit(3).withColumn("n_chars", F.lit(5).cast("long"))
    t.merge(spark, src, ["doc_id"], mode="mor")
    pre = t.scan(spark, version=v_before)
    assert pre.filter(F.col("n_chars") == 5).count() == 0
    assert pre.count() == docs.count()


def test_loader_row_level_mode_mor(spark, tmp_path):
    """LoaderConfig(row_level_mode='mor') routes the upsert strategy
    through equality-delete files — end to end through SparkLoader."""
    from iceberg_loader_spark.config import LoaderConfig
    from iceberg_loader_spark.loader import SparkLoader

    docs = _docs(spark)
    wh = Warehouse(str(tmp_path / "wh"))
    loader = SparkLoader(spark, wh)
    base_cfg = LoaderConfig(load_timestamp=False)
    loader.load_data(docs, "db.docs", base_cfg)

    upd = docs.limit(3).withColumn("n_chars", F.lit(424242).cast("long"))
    cfg = LoaderConfig(
        join_cols=("doc_id",), row_level_mode="mor", load_timestamp=False
    )
    loader.load_data(upd, "db.docs", cfg)

    t = wh.load_table("db.docs")
    assert len(t.snapshot().delete_files) >= 1  # took the MoR path
    out = t.scan(spark)
    assert out.count() == docs.count()
    assert out.filter(F.col("n_chars") == 424242).count() == 3


def test_loader_config_rejects_bad_row_level_mode():
    import pytest

    from iceberg_loader_spark.config import ConfigError, LoaderConfig

    with pytest.raises(ConfigError, match="row_level_mode"):
        LoaderConfig(row_level_mode="nope")


def test_op_applies_stats_pruning():
    """Equality-delete stats pruning: key-range-disjoint files skip the
    anti-join; overlapping or stat-less files keep it."""
    from iceberg_loader_spark.tables.format import DataFile
    from iceberg_loader_spark.tables.table import _op_applies

    op = {
        "kind": "eq",
        "sequence": 5,
        "equality_cols": ["id"],
        "stats": {"id": [100, 200]},
    }
    mk = lambda seq, lo, hi: DataFile(
        path="p", rows=1, bytes=1, stats={"id": [lo, hi]}, sequence=seq
    )
    assert not _op_applies(mk(5, 100, 200), op)  # same sequence: too new
    assert not _op_applies(mk(2, 0, 99), op)  # disjoint below
    assert not _op_applies(mk(2, 201, 900), op)  # disjoint above
    assert _op_applies(mk(2, 150, 300), op)  # overlaps
    assert _op_applies(mk(2, 100, 100), op)  # boundary touch
    no_stats = DataFile(path="p", rows=1, bytes=1, sequence=2)
    assert _op_applies(no_stats, op)  # unknown range: must apply
    pred = {"kind": "pred", "sequence": 5, "where": "x == 1"}
    assert _op_applies(mk(2, 0, 0), pred)  # predicates: sequence only


def test_mor_merge_pruned_scan_still_correct(spark, tmp_path):
    """Two disjoint-key eras + a MoR merge touching only one of them:
    the scan (with stats pruning active) returns the exact upsert
    result."""
    docs = _docs(spark)
    wh = Warehouse(str(tmp_path / "wh"))
    lo = docs.filter(F.col("doc_id") < 100)
    hi = docs.filter(F.col("doc_id") >= 100)
    t = Table.create(wh, "db.t", docs.schema)
    t.append(lo.coalesce(1))
    t.append(hi.coalesce(1))

    src = lo.limit(3).withColumn("n_chars", F.lit(999111).cast("long"))
    t.merge(spark, src, ["doc_id"], mode="mor")

    out = t.scan(spark)
    assert out.count() == docs.count()
    assert out.filter(F.col("n_chars") == 999111).count() == 3
    assert (
        out.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    )


# --------------------------------------------------------------------------
# delete_by_keys + CDC replication (apply_changelog)
# --------------------------------------------------------------------------


def test_delete_by_keys(spark, tmp_path):
    t, docs = _fresh(spark, tmp_path)
    keys = docs.limit(7).select("doc_id")
    snap_files = {f.path for f in t.snapshot().files}
    t.delete_by_keys(spark, keys, ["doc_id"])
    snap = t.snapshot()
    assert {f.path for f in snap.files} == snap_files  # nothing rewritten
    assert len(snap.delete_files) >= 1
    assert t.scan(spark).count() == docs.count() - 7
    # later append of a deleted key is visible (sequence scoping)
    t.append(docs.limit(1))
    assert t.scan(spark).count() == docs.count() - 7 + 1


def test_apply_changelog_replicates_source_operations(spark, tmp_path):
    """End-to-end CDC replication: run append/delete/merge on a source
    table, read its changelog, apply onto an initially-synced replica —
    contents must match exactly."""
    from iceberg_loader_spark.tables.replication import apply_changelog

    docs = _docs(spark)
    wh_dir = Warehouse(str(tmp_path / "whs"))
    src_t = Table.create(wh_dir, "db.src", docs.schema)
    src_t.append(docs)
    base = src_t.meta.current_version()

    replica = Table.create(Warehouse(str(tmp_path / "whr")), "db.rep", docs.schema)
    replica.append(docs)  # initial sync

    # source-side churn: delete a language, upsert some rows, insert one
    src_t.delete_where(spark, "lang == 'de'")
    upd = docs.filter(F.col("lang") == "en").limit(4).withColumn(
        "n_chars", F.lit(555555).cast("long")
    )
    new_row = spark.createDataFrame([(-7, "xx", 3)], docs.schema)
    src_t.merge(spark, upd.unionByName(new_row), ["doc_id"])

    ch = src_t.changes(spark, base)
    res = apply_changelog(spark, replica, ch, ["doc_id"])
    assert res["upserted_keys"] == 5  # 4 updates + 1 insert
    assert res["deleted_keys"] > 0

    src_rows = {
        tuple(r) for r in src_t.scan(spark).collect()
    }
    rep_rows = {
        tuple(r) for r in replica.scan(spark).collect()
    }
    assert src_rows == rep_rows


def test_apply_changelog_last_write_wins_across_commits(spark, tmp_path):
    """A key updated twice then deleted nets out to deleted; a key
    deleted then re-inserted nets out to the re-insert."""
    from pyspark.sql import types as T

    from iceberg_loader_spark.tables.replication import apply_changelog

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    wh_dir = Warehouse(str(tmp_path / "whs"))
    src = Table.create(wh_dir, "db.src", schema)
    src.append(spark.createDataFrame([(1, 10), (2, 20), (3, 30)], schema))
    base = src.meta.current_version()

    rep = Table.create(Warehouse(str(tmp_path / "whr")), "db.rep", schema)
    rep.append(spark.createDataFrame([(1, 10), (2, 20), (3, 30)], schema))

    src.merge(spark, spark.createDataFrame([(1, 11)], schema), ["id"])
    src.merge(spark, spark.createDataFrame([(1, 12)], schema), ["id"])
    src.delete_where(spark, "id == 1")
    src.delete_where(spark, "id == 2")
    src.merge(spark, spark.createDataFrame([(2, 99)], schema), ["id"])

    ch = src.changes(spark, base)
    apply_changelog(spark, rep, ch, ["id"])
    assert {tuple(r) for r in rep.scan(spark).collect()} == {
        tuple(r) for r in src.scan(spark).collect()
    }
