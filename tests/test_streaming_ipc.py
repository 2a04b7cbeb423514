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
