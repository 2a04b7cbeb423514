"""IPC-stream ingest (reference tests/test_streaming.py: 2 batches → 4 rows)."""

import io

import pyarrow as pa

from iceberg_loader_spark.config import LoaderConfig
from iceberg_loader_spark.loader import SparkLoader
from iceberg_loader_spark.tables import Warehouse


def test_ipc_stream_two_batches(spark, tmp_path):
    schema = pa.schema([("id", pa.int64()), ("v", pa.string())])
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, schema) as w:
        w.write_batch(pa.RecordBatch.from_pylist([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}], schema=schema))
        w.write_batch(pa.RecordBatch.from_pylist([{"id": 3, "v": "c"}, {"id": 4, "v": "d"}], schema=schema))
    sink.seek(0)

    wh = Warehouse(str(tmp_path))
    loader = SparkLoader(spark, wh)
    res = loader.load_ipc_stream(
        sink, "db.stream", LoaderConfig(commit_interval=1, load_timestamp=False)
    )
    assert res["rows_loaded"] == 4
    assert res["batches_processed"] == 2
    t = wh.load_table("db.stream")
    appends = [s for s in t.history() if s.operation == "append"]
    assert len(appends) == 2  # one snapshot per batch at interval 1
    assert sorted(r.id for r in t.scan(spark).collect()) == [1, 2, 3, 4]


def test_distributed_ipc_dir_read(spark, tmp_path):
    """A3 scale path: a directory of IPC files decoded executor-side."""
    import pyarrow as pa

    from iceberg_loader_spark.sources.ipc import read_ipc_dir

    schema = pa.schema([("id", pa.int64()), ("name", pa.string())])
    total = 0
    for f_i in range(3):
        rows = [{"id": f_i * 100 + i, "name": f"r{i}"} for i in range(50)]
        total += len(rows)
        tbl = pa.Table.from_pylist(rows, schema=schema)
        with pa.OSFile(str(tmp_path / f"part{f_i}.arrow"), "wb") as sink:
            with pa.ipc.new_stream(sink, schema) as w:
                w.write_table(tbl, max_chunksize=20)
    df = read_ipc_dir(spark, str(tmp_path))
    assert df.count() == total
    assert dict(df.dtypes) == {"id": "bigint", "name": "string"}
    assert df.agg({"id": "min"}).first()[0] == 0
