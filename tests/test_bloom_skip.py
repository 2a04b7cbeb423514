"""Bloom-filter file skipping for equality deletes (tables/bloom.py).

Range stats can't prune files whose key RANGES overlap; the per-file key
bloom skips them when the key SETS don't intersect. These tests pin:
hash-contract parity between the Spark write pass and the driver probe,
manifest round-tripping, the skip decision itself, and end-to-end scan
correctness with blooms active."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables import bloom as B
from iceberg_loader_spark.tables.table import Table, _op_applies


def _interleaved_table(spark, tmp_path, name="db.bloomed"):
    """Two files with fully-overlapping id ranges: file A = even ids
    0..198, file B = odd ids 1..199. Range pruning can never separate
    them; only the bloom can."""
    schema = (
        spark.range(0).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        )
    ).schema
    t = Table.create(
        Warehouse(str(tmp_path / "wh")),
        name,
        schema,
        properties={"write.bloom.keys": "k"},
    )
    even = spark.range(0, 200, 2).select(
        F.col("id").alias("k"), F.lit("even").alias("v")
    ).coalesce(1)
    odd = spark.range(1, 200, 2).select(
        F.col("id").alias("k"), F.lit("odd").alias("v")
    ).coalesce(1)
    t.append(even)
    t.append(odd)
    return t


def test_hash_contract_spark_matches_python(spark):
    """The Spark-side (h1, h2) pair must equal the driver-side one for
    the same key tuple — the whole scheme rests on this."""
    df = spark.createDataFrame(
        [(1, "a"), (42, "b"), (99999999999, "weird ' key")],
        "k1 long, k2 string",
    )
    h1, h2 = B._hash_pair_cols(["k1", "k2"])
    got = {
        (r["k1"], r["k2"]): (r["h1"], r["h2"])
        for r in df.select("k1", "k2", h1.alias("h1"), h2.alias("h2")).collect()
    }
    for key, pair in got.items():
        assert pair == B.hash_pair_py(key), key


def test_entries_carry_blooms_and_roundtrip(spark, tmp_path):
    t = _interleaved_table(spark, tmp_path)
    snap = t.snapshot()
    assert len(snap.files) == 2
    for f in snap.files:
        assert f.bloom is not None
        assert f.bloom["keys"] == ["k"]
        assert f.bloom["m"] == B.BLOOM_M and f.bloom["k"] == B.BLOOM_K
    # manifest JSON round-trip preserves the bloom
    t2 = Table(Warehouse(str(tmp_path / "wh")), "db.bloomed")
    assert all(f.bloom is not None for f in t2.snapshot().files)


def test_bloom_skips_range_overlapping_file(spark, tmp_path):
    t = _interleaved_table(spark, tmp_path)
    even_file = next(
        f for f in t.snapshot().files if f.stats["k"][0] == 0
    )
    odd_file = next(
        f for f in t.snapshot().files if f.stats["k"][0] == 1
    )
    # ranges fully overlap — range pruning alone cannot separate them
    assert even_file.stats["k"] == [0, 198]
    assert odd_file.stats["k"] == [1, 199]

    keys = spark.createDataFrame([(2,), (4,), (6,)], "k long")
    t.delete_by_keys(spark, keys, ["k"])
    op = dict(t.snapshot().delete_files[-1])
    assert op.get("probe"), "small delete must carry probe hashes"
    op["kind"] = "eq"

    # all delete keys are even: the odd file must be bloom-skipped,
    # the even file must stay a candidate
    assert _op_applies(even_file, op) is True
    assert _op_applies(odd_file, op) is False


def test_scan_correct_with_blooms(spark, tmp_path):
    t = _interleaved_table(spark, tmp_path)
    keys = spark.createDataFrame([(2,), (5,), (100,)], "k long")
    t.delete_by_keys(spark, keys, ["k"])
    got = sorted(r["k"] for r in t.scan(spark).collect())
    expect = sorted(set(range(200)) - {2, 5, 100})
    assert got == expect


def test_mor_merge_carries_probe_and_stays_correct(spark, tmp_path):
    t = _interleaved_table(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, "updated"), (1000, "new")], "k long, v string"
    )
    t.merge(spark, src, ["k"], mode="mor")
    op = t.snapshot().delete_files[-1]
    assert op.get("probe"), "MoR merge delete must carry probe hashes"
    rows = {r["k"]: r["v"] for r in t.scan(spark).collect()}
    assert rows[2] == "updated"
    assert rows[1000] == "new"
    assert rows[3] == "odd"
    assert len(rows) == 201


def test_large_key_set_falls_back_to_range_pruning(spark, tmp_path):
    t = _interleaved_table(spark, tmp_path)
    many = spark.range(0, B.PROBE_CAP + 1).select(F.col("id").alias("k"))
    t.delete_by_keys(spark, many, ["k"])
    op = t.snapshot().delete_files[-1]
    assert "probe" not in op
    # correctness unaffected: everything below the cap is gone
    got = sorted(r["k"] for r in t.scan(spark).collect())
    assert got == []


def test_bloom_false_positive_is_only_cost_never_wrong(spark, tmp_path):
    """A key absent from the table deletes nothing even when its bloom
    probe happens to pass (conservative tier, correctness unaffected)."""
    t = _interleaved_table(spark, tmp_path)
    keys = spark.createDataFrame([(12345678,)], "k long")
    t.delete_by_keys(spark, keys, ["k"])
    assert t.scan(spark).count() == 200


def test_unknown_bloom_column_rejected(spark, tmp_path):
    schema = spark.range(1).select(F.col("id").alias("k")).schema
    t = Table.create(
        Warehouse(str(tmp_path / "wh")),
        "db.badbloom",
        schema,
        properties={"write.bloom.keys": "nope"},
    )
    try:
        t.append(spark.range(3).select(F.col("id").alias("k")))
    except ValueError as e:
        assert "nope" in str(e)
    else:
        raise AssertionError("expected ValueError for unknown bloom column")
