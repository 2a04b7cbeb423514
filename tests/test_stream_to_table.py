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


def test_idempotent_sink_exactly_once_under_replay(spark, tmp_path):
    """IdempotentTableSink: a replayed micro-batch (foreachBatch's
    at-least-once recovery contract) must be skipped, a fresh batch must
    land, and the progress marker must ride the SAME snapshot as the
    rows."""
    from iceberg_loader_spark.streaming import IdempotentTableSink

    wh = Warehouse(str(tmp_path / "wh"))
    sink = IdempotentTableSink(wh, "db.eo_sink")

    stream = streaming_events(spark, SF_SMOKE).select(
        "event_id", "user_id", "event_type", "value"
    )
    q = stream.writeStream.foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()

    t = wh.load_table("db.eo_sink")
    src_rows = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert t.scan(spark).count() == src_rows
    n_snaps = len(t.history())
    last_batch = int(t.properties()["streaming.default.last-batch-id"])
    assert last_batch >= 0

    # simulate the engine re-executing the last micro-batch after a crash
    replay_df = t.scan(spark).limit(5)
    sink(replay_df, last_batch)
    t = wh.load_table("db.eo_sink")
    assert t.scan(spark).count() == src_rows, "replayed batch must be skipped"
    assert len(t.history()) == n_snaps
    assert sink.skipped_batches == 1

    # a genuinely new batch lands, and its marker is in the same snapshot
    sink(replay_df, last_batch + 1)
    t = wh.load_table("db.eo_sink")
    assert t.scan(spark).count() == src_rows + 5
    assert (
        t.properties()["streaming.default.last-batch-id"]
        == str(last_batch + 1)
    )
    assert len(t.history()) == n_snaps + 1
