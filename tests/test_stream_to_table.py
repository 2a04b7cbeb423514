"""Streaming ingest integration (SURVEY.md §3.4 Spark lifecycle): a
Structured Streaming source drained through foreachBatch into the
warehouse via SparkLoader — one snapshot per micro-batch, the streaming
form of the reference's commit-interval loop (core/loader.py:210-235)."""

from __future__ import annotations

from iceberg_loader_spark.config import LoaderConfig
from iceberg_loader_spark.loader import SparkLoader
from iceberg_loader_spark.streaming.windows import streaming_events
from iceberg_loader_spark.tables import Warehouse
from tests.conftest import SF_SMOKE


def test_foreach_batch_ingest_snapshots_and_rows(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    loader = SparkLoader(spark, wh)
    cfg = LoaderConfig(commit_interval=100, load_timestamp=False)

    stream = streaming_events(spark, SF_SMOKE).select(
        "event_id", "user_id", "event_type", "value"
    )

    def sink(batch_df, batch_id: int) -> None:
        loader.load_data(batch_df, "db.events_sink", cfg)

    q = stream.writeStream.foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()

    t = wh.load_table("db.events_sink")
    src_rows = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert t.scan(spark).count() == src_rows
    # ≥1 snapshot per micro-batch, none lost
    assert len(t.history()) >= 1
    assert t.snapshot().total_rows == src_rows
