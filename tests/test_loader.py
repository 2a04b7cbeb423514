"""Loader behavior parity (reference tests/test_iceberg_loader.py +
examples/load_with_commits.py + examples/load_upsert.py), run against a
REAL embedded warehouse instead of mock catalogs."""

import pyarrow as pa
import pytest

from iceberg_loader_spark.config import LoaderConfig
from iceberg_loader_spark.loader import SparkLoader
from iceberg_loader_spark.tables import Warehouse


@pytest.fixture()
def wh(tmp_path):
    return Warehouse(str(tmp_path / "warehouse"))


def _basic_rows():
    return [
        {"id": 1, "name": "a", "date_col": "2023-01-01"},
        {"id": 2, "name": "b", "date_col": "2023-01-02"},
    ]


def test_create_and_append(spark, wh):
    loader = SparkLoader(spark, wh)
    res = loader.load_data(_basic_rows(), "db.t")
    assert res["new_table_created"] is True
    assert res["rows_loaded"] == 2
    assert res["write_mode"] == "append"
    assert res["snapshot_id"]
    t = wh.load_table("db.t")
    assert t.scan(spark).count() == 2
    res2 = loader.load_data(_basic_rows(), "db.t")
    assert res2["new_table_created"] is False
    assert wh.load_table("db.t").scan(spark).count() == 4


def test_module_level_convenience_api(spark, wh, tmp_path):
    """The quickstart one-call loaders (reference __init__.py:7-13 /
    iceberg_loader.py:13-52) work from the package root and accept a
    plain warehouse path."""
    import iceberg_loader_spark as ils

    for name in (
        "load_data_to_table",
        "load_batches_to_table",
        "load_ipc_stream_to_table",
        "SparkLoader",
        "LoaderConfig",
        "Warehouse",
    ):
        assert name in ils.__all__

    res = ils.load_data_to_table(_basic_rows(), "db.conv", spark, wh)
    assert res["new_table_created"] is True and res["rows_loaded"] == 2

    batches = iter(pa.Table.from_pylist(_basic_rows()).to_batches())
    res = ils.load_batches_to_table(batches, "db.conv", spark, wh)
    assert res["rows_loaded"] == 2
    assert wh.load_table("db.conv").scan(spark).count() == 4

    # IPC stream path + warehouse given as a plain path string
    import io

    tbl = pa.Table.from_pylist(_basic_rows())
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    sink.seek(0)
    res = ils.load_ipc_stream_to_table(
        sink, "db.ipc", spark, str(tmp_path / "wh2")
    )
    assert res["new_table_created"] is True and res["rows_loaded"] == 2


def test_load_timestamp_column(spark, wh):
    loader = SparkLoader(spark, wh)
    loader.load_data(_basic_rows(), "db.t", LoaderConfig(load_ts_col="_ingested_at"))
    df = wh.load_table("db.t").scan(spark)
    assert "_ingested_at" in df.columns
    vals = [r["_ingested_at"] for r in df.collect()]
    assert len(set(vals)) == 1 and vals[0] is not None


def test_no_load_timestamp_when_disabled(spark, wh):
    loader = SparkLoader(spark, wh)
    loader.load_data(_basic_rows(), "db.t", LoaderConfig(load_timestamp=False))
    assert "_load_dttm" not in wh.load_table("db.t").scan(spark).columns


def test_overwrite_first_flush_only(spark, wh):
    """Reference core/strategies.py:36-48: stream-preserving overwrite."""
    loader = SparkLoader(spark, wh)
    loader.load_data(_basic_rows(), "db.t")
    cfg = LoaderConfig(write_mode="overwrite", commit_interval=1)
    batches = iter(
        pa.Table.from_pylist([{"id": i, "name": f"n{i}"} for i in range(10, 14)])
        .to_batches(max_chunksize=2)
    )
    res = loader.load_data_batches(batches, "db.t", cfg)
    # first flush overwrote the 2 original rows, second flush appended
    assert res["rows_loaded"] == 4
    ids = sorted(r.id for r in wh.load_table("db.t").scan(spark).collect())
    assert ids == [10, 11, 12, 13]


def test_replace_filter_idempotent(spark, wh):
    """Reference core/strategies.py:51-66 + tests:119-123."""
    loader = SparkLoader(spark, wh)
    loader.load_data(_basic_rows(), "db.t")
    cfg = LoaderConfig(replace_filter="date_col == '2023-01-01'")
    replacement = [
        {"id": 10, "name": "r1", "date_col": "2023-01-01"},
        {"id": 11, "name": "r2", "date_col": "2023-01-01"},
    ]
    res = loader.load_data(replacement, "db.t", cfg)
    assert res["write_mode"] == "replace"
    rows = {(r.id, r.date_col) for r in wh.load_table("db.t").scan(spark).collect()}
    # id=1 (2023-01-01) replaced by 10/11; id=2 (2023-01-02) untouched
    assert {r[0] for r in rows} == {2, 10, 11}
    # running the same load again is idempotent
    loader.load_data(replacement, "db.t", cfg)
    ids = sorted(r.id for r in wh.load_table("db.t").scan(spark).collect())
    assert ids == [2, 10, 11]


def test_upsert_semantics(spark, wh):
    """Reference examples/load_upsert.py:28-57 (FIXTURES.md F4)."""
    loader = SparkLoader(spark, wh)
    loader.load_data(
        [
            {"id": 1, "name": "Alice"},
            {"id": 2, "name": "Bob"},
            {"id": 3, "name": "Charlie"},
        ],
        "db.users",
        LoaderConfig(load_timestamp=False),
    )
    res = loader.load_data(
        [{"id": 2, "name": "Bob Updated"}, {"id": 4, "name": "David"}],
        "db.users",
        LoaderConfig(join_cols=("id",), load_timestamp=False),
    )
    assert res["write_mode"] == "upsert"
    rows = dict(
        (r.id, r.name) for r in wh.load_table("db.users").scan(spark).collect()
    )
    assert rows == {1: "Alice", 2: "Bob Updated", 3: "Charlie", 4: "David"}
    snap = wh.load_table("db.users").snapshot()
    assert snap.summary["updated-records"] == 1
    assert snap.summary["inserted-records"] == 1


def test_upsert_duplicate_source_keys_rejected(spark, wh):
    loader = SparkLoader(spark, wh)
    loader.load_data([{"id": 1, "v": "a"}], "db.t", LoaderConfig(load_timestamp=False))
    with pytest.raises(ValueError, match="duplicate join keys"):
        loader.load_data(
            [{"id": 1, "v": "x"}, {"id": 1, "v": "y"}],
            "db.t",
            LoaderConfig(join_cols=("id",), load_timestamp=False),
        )


def test_commit_interval_snapshot_count(spark, wh):
    """20 batches, interval 5 → 4 snapshots (examples/load_with_commits.py)."""
    loader = SparkLoader(spark, wh)
    batches = [
        pa.RecordBatch.from_pylist([{"id": i * 100 + j, "batch_id": i} for j in range(100)])
        for i in range(20)
    ]
    res = loader.load_data_batches(
        iter(batches), "db.commits", LoaderConfig(commit_interval=5)
    )
    assert res["rows_loaded"] == 2000
    assert res["batches_processed"] == 20
    t = wh.load_table("db.commits")
    # 1 create + 4 appends
    append_snaps = [s for s in t.history() if s.operation == "append"]
    assert len(append_snaps) == 4
    assert t.scan(spark).count() == 2000


def test_schema_evolution_mid_stream(spark, wh):
    """FIXTURES.md F3: batch2 adds a column; batch1 rows get NULL."""
    loader = SparkLoader(spark, wh)
    b1 = pa.RecordBatch.from_pylist([{"id": 1, "value": "v1"}])
    b2 = pa.RecordBatch.from_pylist([{"id": 2, "value": "v2", "extra": "e2"}])
    res = loader.load_data_batches(
        iter([b1, b2]),
        "db.evolve",
        LoaderConfig(schema_evolution=True, commit_interval=1, load_timestamp=False),
    )
    assert res["rows_loaded"] == 2
    df = wh.load_table("db.evolve").scan(spark)
    assert set(df.columns) == {"id", "value", "extra"}
    rows = {r.id: r.extra for r in df.collect()}
    assert rows == {1: None, 2: "e2"}


def test_schema_evolution_disabled_drops_new_cols(spark, wh):
    loader = SparkLoader(spark, wh)
    loader.load_data([{"id": 1, "v": "a"}], "db.t", LoaderConfig(load_timestamp=False))
    loader.load_data(
        [{"id": 2, "v": "b", "extra": "x"}], "db.t", LoaderConfig(load_timestamp=False)
    )
    df = wh.load_table("db.t").scan(spark)
    assert set(df.columns) == {"id", "v"}
    assert df.count() == 2


def test_mixed_schema_within_one_buffer(spark, wh):
    """Reference core/loader.py:70-107: concat fallback re-normalizes."""
    loader = SparkLoader(spark, wh)
    b1 = pa.RecordBatch.from_pylist([{"id": 1, "value": "v1"}])
    b2 = pa.RecordBatch.from_pylist([{"id": 2, "value": "v2", "extra": "e2"}])
    res = loader.load_data_batches(
        iter([b1, b2]),
        "db.mixed",
        LoaderConfig(schema_evolution=True, commit_interval=10, load_timestamp=False),
    )
    assert res["rows_loaded"] == 2
    rows = {r.id: r.extra for r in wh.load_table("db.mixed").scan(spark).collect()}
    assert rows == {1: None, 2: "e2"}


def test_uint64_to_decimal(spark, wh):
    loader = SparkLoader(spark, wh)
    t = pa.table({"id": pa.array([2**63 + 10, 5], pa.uint64())})
    loader.load_data(t, "db.u64", LoaderConfig(load_timestamp=False))
    df = wh.load_table("db.u64").scan(spark)
    assert dict(df.dtypes)["id"] == "decimal(20,0)"
    assert sorted(int(r.id) for r in df.collect()) == [5, 2**63 + 10]


def test_string_ts_promotion_with_day_partition(spark, wh):
    """FIXTURES.md F2: day(signup_date) on string column promotes to ts."""
    loader = SparkLoader(spark, wh)
    loader.load_data(
        [{"id": 1, "signup_date": "2023-01-01"}],
        "db.promo",
        LoaderConfig(partition_by="day(signup_date)", load_timestamp=False),
    )
    t = wh.load_table("db.promo")
    assert dict(t.scan(spark).dtypes)["signup_date"] == "timestamp_ntz"
    assert t.snapshot().partition_spec[0]["name"] == "signup_date_day"
    assert t.snapshot().files[0].partition == {"signup_date_day": "2023-01-01"}


def test_result_dict_fields(spark, wh):
    loader = SparkLoader(spark, wh)
    res = loader.load_data(_basic_rows(), "db.t")
    assert set(res) == {
        "rows_loaded",
        "batches_processed",
        "write_mode",
        "partition_col",
        "table_location",
        "snapshot_id",
        "new_table_created",
    }


def test_load_table_cache_invalidates_on_inplace_part_rewrite(spark, tmp_path):
    """ADVICE r6: POSIX directory mtime only moves when a DIRECT child is
    created/removed/renamed — an in-place rewrite of an existing part
    file must still invalidate the memoized plan. The cache now pins a
    fingerprint of every contained file's (relpath, size, mtime)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_loader_spark.sources.tables import load_table

    sf_dir = str(tmp_path)
    d = os.path.join(sf_dir, "part.parquet")
    os.makedirs(d)
    part = os.path.join(d, "part-00000.parquet")
    pq.write_table(pa.table({"id": [1, 2]}), part)
    assert load_table(spark, sf_dir, "part").count() == 2
    # rewrite the SAME file in place: no child created/removed/renamed,
    # so the parent directory's mtime is unchanged
    pq.write_table(pa.table({"id": [1, 2, 3]}), part)
    assert load_table(spark, sf_dir, "part").count() == 3
    # unchanged path → cache hit (same DataFrame object)
    a = load_table(spark, sf_dir, "part")
    b = load_table(spark, sf_dir, "part")
    assert a is b
