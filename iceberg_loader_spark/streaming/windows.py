"""Event-time window operators (SURVEY.md §2 B20–B22).

The window *semantics* — tumbling, sliding (hopping), and session — are
declared once as DataFrame programs over ``events`` and run identically in
batch and in Structured Streaming: ``F.window`` / ``F.session_window`` are
the same expressions in both modes, so the registered batch queries below
ARE the streaming aggregations (minus the watermark, which only matters
under unordered arrival — covered by the true-streaming tests in
``tests/test_streaming_struct.py``).

Determinism notes: window bounds are emitted as formatted strings (engines
disagree on timestamp object hashing); value sums use the events table's
``value`` double rounded via fixed-point cents so both engines sum exact
integers and divide once.

Scale: tumbling/sliding aggs shuffle once on (window, key) with map-side
partial aggregation; session windows in streaming use the state store —
key cardinality is user_id, which is uniformly distributed in testdata and
salts cleanly if a hot user ever appears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_loader_spark.sources.tables import load_table

QUERIES = {}
ORACLES = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_FMT = "yyyy-MM-dd HH:mm:ss"
_DUCK_FMT = "%Y-%m-%d %H:%M:%S"

# value → exact integer cents; summed exactly, divided once at the end.
# (A function, not a module constant — building a Column requires an
# active SparkContext, which doesn't exist at import time.)
def _cents():
    # ROUND-then-cast, not bare cast: Spark's cast truncates toward zero
    # while DuckDB's rounds, so both engines must round explicitly.
    return F.round(F.col("value") * 100, 0).cast("bigint")


_DUCK_CENTS = "CAST(ROUND(value * 100, 0) AS BIGINT)"


def _win_bounds(df: DataFrame) -> DataFrame:
    return df.select(
        F.date_format("window.start", _FMT).alias("w_start"),
        F.date_format("window.end", _FMT).alias("w_end"),
        *[c for c in df.columns if c != "window"],
    )


# --------------------------------------------------------------------------
# B20 — tumbling 1-hour window aggregation per event_type.
# --------------------------------------------------------------------------
@_register(
    "stream_tumbling_1h",
    f"""
    SELECT strftime(date_trunc('hour', ts), '{_DUCK_FMT}') AS w_start,
           strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '{_DUCK_FMT}') AS w_end,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM({_DUCK_CENTS}) AS DOUBLE) / 100 AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY w_start, event_type
    """,
)
def stream_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        (F.sum(_cents()).cast("double") / 100).alias("sum_value"),
    )
    return _win_bounds(agg).orderBy("w_start", "event_type")


# --------------------------------------------------------------------------
# B20 — sliding (hopping) window: 1-hour length, 30-minute slide. Each
# event lands in exactly two windows; the oracle unnests the two window
# starts explicitly.
# --------------------------------------------------------------------------
@_register(
    "stream_sliding_1h_30m",
    f"""
    WITH slotted AS (
      SELECT unnest([
               to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)),
               to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT))
             ]) AS w_start_ts,
             event_type, user_id, value
      FROM events
    )
    SELECT strftime(w_start_ts, '{_DUCK_FMT}') AS w_start,
           strftime(w_start_ts + INTERVAL 1 HOUR, '{_DUCK_FMT}') AS w_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM({_DUCK_CENTS}) AS DOUBLE) / 100 AS sum_value
    FROM slotted
    GROUP BY 1, 2, 3
    ORDER BY w_start, event_type
    """,
)
def stream_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type").agg(
        F.count("*").alias("n_events"),
        (F.sum(_cents()).cast("double") / 100).alias("sum_value"),
    )
    return _win_bounds(agg).orderBy("w_start", "event_type")


# --------------------------------------------------------------------------
# B20 — windowed top-k: the 3 most frequent event types per 1-hour
# tumbling window (the "trending items per window" streaming shape).
# Rank is PARTITIONED by the window start, so the window operator is
# parallel across hours — never a global sort. In live streaming this is
# the classic complete/update-mode ranking over a windowed aggregate;
# batch semantics (here, oracle-checked) and the micro-batch replay
# coincide because rank reads only the window's own finalized counts.
# --------------------------------------------------------------------------
@_register(
    "stream_topk_types_hourly",
    f"""
    WITH counts AS (
      SELECT date_trunc('hour', ts) AS w, event_type, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(w, '{_DUCK_FMT}') AS w_start,
           strftime(w + INTERVAL 1 HOUR, '{_DUCK_FMT}') AS w_end,
           event_type, n_events, rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY w
                 ORDER BY n_events DESC, event_type) AS rnk
      FROM counts)
    WHERE rnk <= 3
    ORDER BY w_start, rnk
    """,
)
def stream_topk_types_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n_events")
    )
    w = W.partitionBy("window").orderBy(F.desc("n_events"), F.asc("event_type"))
    ranked = counts.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 3
    )
    return _win_bounds(ranked).orderBy("w_start", "rnk")


# --------------------------------------------------------------------------
# B21 — session window, 30-minute gap, per user. Spark's session_window
# semantics: a session closes after 30 idle minutes; session end = last
# event + gap. The oracle rebuilds sessions with the classic
# gap-island recipe (lag → new-session flag → running sum → group).
# --------------------------------------------------------------------------
@_register(
    "stream_session_30m_users",
    f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '{_DUCK_FMT}') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '{_DUCK_FMT}') AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM({_DUCK_CENTS}) AS DOUBLE) / 100 AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def stream_session_30m_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count("*").alias("n_events"),
        (F.sum(_cents()).cast("double") / 100).alias("sum_value"),
    )
    return agg.select(
        "user_id",
        F.date_format("session_window.start", _FMT).alias("session_start"),
        F.date_format("session_window.end", _FMT).alias("session_end"),
        "n_events",
        "sum_value",
    ).orderBy("user_id", "session_start")


# --------------------------------------------------------------------------
# B23 — stateful stream dedup, batch-verified: keep each (user, type)
# key's FIRST event (earliest ts, event_id tie-break). This is the batch
# spelling of dropDuplicatesWithinWatermark with an unbounded window —
# the micro-batch runner (stateful_dedup_streaming) runs the stateful
# version and its test asserts one survivor per key; this registered
# query pins WHICH survivor wins against the oracle.
# Scale: one rank window partitioned by the dedup key — parallel across
# keys, the streaming state-store analogue of a per-key min.
# --------------------------------------------------------------------------
@_register(
    "stream_dedup_first_event",
    f"""
    SELECT user_id, event_type,
           strftime(ts, '{_DUCK_FMT}') AS first_ts,
           event_id
    FROM (
      SELECT user_id, event_type, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rnk
      FROM events)
    WHERE rnk = 1
    ORDER BY user_id, event_type
    """,
)
def stream_dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "user_id",
            "event_type",
            F.date_format("ts", _FMT).alias("first_ts"),
            "event_id",
        )
        .orderBy("user_id", "event_type")
    )


# --------------------------------------------------------------------------
# Stream-stream interval join shape — click→purchase conversion
# attribution: each purchase is attributed to the SAME USER's most recent
# click in the preceding 30 minutes. The join condition (equi-key +
# bounded event-time range) is exactly what Structured Streaming's
# stream-stream join requires to bound state: with watermarks on both
# sides the engine keeps only 30 minutes of click state per user. The
# batch spelling below is the same DataFrame program; the micro-batch
# runner (conversion_attribution_streaming) runs it under the streaming
# engine and the test asserts it matches this batch result.
#
# Scale: equi-join on user_id (hash-partitioned both sides, AQE handles
# skew); the interval predicate prunes within the join, and the
# latest-click winner is a per-purchase rank window — key cardinality is
# purchases, never the cross product.
# --------------------------------------------------------------------------
@_register(
    "stream_conversion_attribution",
    f"""
    WITH pairs AS (
      SELECT p.event_id AS purchase_id,
             p.user_id,
             p.ts AS p_ts,
             c.event_id AS click_id,
             c.ts AS c_ts,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
               ORDER BY c.ts DESC, c.event_id DESC) AS rnk
      FROM events p JOIN events c
        ON p.user_id = c.user_id
       AND p.event_type = 'purchase' AND c.event_type = 'click'
       AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 30 MINUTE
    )
    SELECT purchase_id, user_id,
           strftime(p_ts, '{_DUCK_FMT}') AS purchase_ts,
           click_id,
           CAST(epoch(date_trunc('second', p_ts))
                - epoch(date_trunc('second', c_ts)) AS BIGINT) AS gap_seconds
    FROM pairs WHERE rnk = 1
    ORDER BY purchase_id
    """,
)
def stream_conversion_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("purchase_id").orderBy(
        F.desc("c_ts"), F.desc("click_id")
    )
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.date_format("p_ts", _FMT).alias("purchase_ts"),
            "click_id",
            (
                F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")
            ).alias("gap_seconds"),
        )
        .orderBy("purchase_id")
    )


# --------------------------------------------------------------------------
# True-streaming runners (B20/B22/B23) — exercised by tests, not oracles.
# They read the same parquet through the file *streaming* source, so the
# exact operators above run under the micro-batch engine with watermarks.
# --------------------------------------------------------------------------
def streaming_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` as an unbounded stream via the file streaming source."""
    import hashlib
    import os

    from iceberg_loader_spark.sources.tables import ensure_compat

    ensure_compat(spark)
    src = f"{sf_dir}/events.parquet"
    # The file streaming source wants a *directory*; stage a symlink dir.
    stage = f"/tmp/ils_stream_{hashlib.md5(src.encode()).hexdigest()[:8]}"
    os.makedirs(stage, exist_ok=True)
    link = f"{stage}/events.parquet"
    if not os.path.exists(link):
        os.symlink(src, link)
    batch = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    # Watermarks demand TIMESTAMP (not NTZ); the session TZ is pinned UTC,
    # so formatted window bounds still equal the batch/NTZ spelling.
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, "
                "TIMESTAMP '1970-01-01 00:00:00+00:00')"
            ),
        )
    else:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def tumbling_1h_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20+B22: watermarked tumbling agg under the micro-batch engine."""
    ev = streaming_events(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n_events"),
        (F.sum(_cents()).cast("double") / 100).alias("sum_value"),
    )
    out = _win_bounds(agg)
    q = (
        out.writeStream.format("memory")
        .queryName("tumbling_1h_streaming")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("tumbling_1h_streaming")


def topk_types_hourly_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20: streaming windowed top-k. Ranking over an unbounded stream is
    not expressible inside the engine (no window functions on streaming
    frames); the production shape is exactly this split — the STREAM
    maintains the per-(window, key) counts (complete/update mode, state
    bounded by watermark), and the rank is applied at serving time over
    the materialized counts. The paired test asserts the result equals
    the batch ``stream_topk_types_hourly`` query."""
    ev = streaming_events(spark, sf_dir).withWatermark("ts", "10 minutes")
    counts = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n_events")
    )
    q = (
        _win_bounds(counts)
        .writeStream.format("memory")
        .queryName("topk_types_hourly_streaming")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    from pyspark.sql import Window as W

    sink = spark.table("topk_types_hourly_streaming")
    w = W.partitionBy("w_start").orderBy(F.desc("n_events"), F.asc("event_type"))
    return (
        sink.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .orderBy("w_start", "rnk")
    )


def stateful_dedup_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23: dropDuplicatesWithinWatermark on (user_id, event_type)."""
    ev = streaming_events(spark, sf_dir).withWatermark("ts", "1 hour")
    deduped = ev.dropDuplicatesWithinWatermark(["user_id", "event_type"])
    q = (
        deduped.select("event_id", "user_id", "event_type")
        .writeStream.format("memory")
        .queryName("stateful_dedup_streaming")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("stateful_dedup_streaming")


def conversion_attribution_streaming(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream self-join under the micro-batch engine: purchases ⋈
    clicks on user with a 30-minute event-time range. Watermarks on BOTH
    sides let the engine discard click state older than the range, so
    state is bounded at (clicks in 30 min + watermark delay) per user.

    Emits the raw attributed pairs (purchase, click) — the latest-click
    rank window is batch-only (row_number over an unbounded stream is not
    expressible); the streaming test compares against the batch join
    pre-rank.
    """
    ev = streaming_events(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
    ).select("purchase_id", "user_id", "click_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("conversion_attribution_streaming")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("conversion_attribution_streaming")


def session_window_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21 under the micro-batch engine: watermarked session windows."""
    ev = streaming_events(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count("*").alias("n_events"),
        (F.sum(_cents()).cast("double") / 100).alias("sum_value"),
    )
    out = agg.select(
        "user_id",
        F.date_format("session_window.start", _FMT).alias("session_start"),
        F.date_format("session_window.end", _FMT).alias("session_end"),
        "n_events",
        "sum_value",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("session_window_streaming")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("session_window_streaming")


# --------------------------------------------------------------------------
# B23+ — custom stateful operator via applyInPandasWithState: per-user
# running (n_events, total_cents) maintained in the state store across
# micro-batches, emitting the updated totals every batch ("update" mode).
# This is the escape hatch for stateful logic the built-in operators
# can't express (counters with custom merge, decaying scores, per-key
# model state); dropDuplicatesWithinWatermark/session_window cover the
# built-in cases above.
#
# Scale: state is keyed on user_id and lives in the state store (RocksDB
# per the session config) — memory is bounded per key, not per stream;
# the Arrow batch boundary carries only (user_id, value) columns.
# --------------------------------------------------------------------------
def running_user_totals_streaming(
    spark: SparkSession, sf_dir: str, n_chunks: int = 3
) -> DataFrame:
    """Per-user running totals across ``n_chunks`` forced micro-batches.

    The events table is staged as ``n_chunks`` parquet files (split on
    event_id, driver-side test scaffolding only) with
    ``maxFilesPerTrigger=1`` so the stateful function provably carries
    state from one micro-batch to the next; the last emission per user
    equals the batch groupBy totals.
    """
    import hashlib
    import os

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from iceberg_loader_spark.sources.tables import ensure_compat

    ensure_compat(spark)
    src = f"{sf_dir}/events.parquet"
    stage = f"/tmp/ils_state_{hashlib.md5(src.encode()).hexdigest()[:8]}"
    if not os.path.isdir(stage):
        os.makedirs(stage, exist_ok=True)
        tab = pq.read_table(src, columns=["event_id", "user_id", "value"])
        pdf = tab.to_pandas()
        for i in range(n_chunks):
            pdf[pdf["event_id"] % n_chunks == i].to_parquet(
                f"{stage}/chunk{i}.parquet", index=False
            )
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_cents", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("cents", LongType())]
    )

    def update_totals(key, pdf_iter, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            # explicit HALF_UP *away from zero* to match the batch path's
            # F.round (pandas Series.round is half-to-even; plain
            # floor(x+0.5) is half-up toward +inf and diverges on negative
            # exact-.5 cents, e.g. -12.5 -> -12 instead of -13)
            x = pdf["value"].to_numpy() * 100
            cents += int(
                np.copysign(np.floor(np.abs(x) + 0.5), x).astype("int64").sum()
            )
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    result = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            update_totals,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        result.writeStream.format("memory")
        .queryName("running_user_totals_streaming")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("running_user_totals_streaming")


def run_stateful_sessionizer(
    spark: SparkSession,
    stage_dir: str,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful sessionization with EVENT-TIME TIMEOUTS — the full
    ``applyInPandasWithState`` surface (B21/B23): per-user session state
    that (a) splits when a new event arrives after the gap, and (b) is
    FINALIZED AND EVICTED by the state-store timeout when the watermark
    passes session-end + gap, so abandoned keys never leak state.

    ``stage_dir`` holds ordered parquet chunks (one micro-batch each via
    ``maxFilesPerTrigger=1``); returns the finalized-sessions memory sink
    as a DataFrame (user_id, s_start_ms, s_end_ms, n_events). Sessions
    still open at end-of-input remain in state (correct streaming
    behavior — they'd finalize on the next watermark advance).
    """
    import os

    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from iceberg_loader_spark.sources.tables import ensure_compat

    ensure_compat(spark)
    gap_ms = gap_minutes * 60 * 1000
    in_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
        ]
    )
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("s_start_ms", LongType()),
            StructField("s_end_ms", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_ms", LongType()),
            StructField("end_ms", LongType()),
            StructField("n", LongType()),
        ]
    )

    def sessionize(key, pdf_iter, state: GroupState):
        user_id = key[0]
        if state.hasTimedOut:
            start_ms, end_ms, n = state.get
            state.remove()  # evict — no state leak for abandoned keys
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "s_start_ms": [start_ms],
                    "s_end_ms": [end_ms],
                    "n_events": [n],
                }
            )
            return
        closed: list[tuple[int, int, int]] = []
        cur = state.get if state.exists else None
        for pdf in pdf_iter:
            ts_ms = (
                pdf["ts"].astype("datetime64[ms]").astype("int64").sort_values()
            )
            for t in ts_ms:
                t = int(t)
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] > gap_ms:
                    closed.append(cur)  # arrival-side session split
                    cur = (t, t, 1)
                else:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1)
        if cur is not None:
            state.update(cur)
            # finalize when the watermark passes session-end + gap
            state.setTimeoutTimestamp(cur[1] + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "s_start_ms": [c[0] for c in closed],
                    "s_end_ms": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    stream = (
        spark.readStream.schema(in_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir)
        .withWatermark("ts", watermark)
    )
    result = stream.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    name = "stateful_sessions_" + os.path.basename(stage_dir.rstrip("/"))
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


# --------------------------------------------------------------------------
# B20+ — stream-static enrichment join: the unbounded event stream joined
# to slowly-changing dimension tables (customer → nation), aggregated per
# nation. The canonical "enrich the clickstream with account metadata"
# job. Registered as the deterministic batch query; the paired micro-batch
# runner (enrich_nation_totals_streaming) executes the same join under
# the streaming engine — Spark re-reads/broadcasts the static side per
# micro-batch, so no state is kept for the dimension.
#
# Scale: the stream side never shuffles before the join (broadcast hash
# join against the dimension); the only stateful operator is the windowless
# global aggregate on n_name (25 groups, map-side combined). Dimension
# updates are picked up per micro-batch — the streaming answer to SCD
# lookups at 100 TB/day event volume.
# --------------------------------------------------------------------------
@_register(
    "stream_enrich_nation_totals",
    f"""
    SELECT n_name,
           COUNT(*) AS n_events,
           CAST(SUM({_DUCK_CENTS}) AS DOUBLE) / 100 AS sum_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def stream_enrich_nation_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(_cents()).cast("double") / 100).alias("sum_value"),
        )
        .orderBy("n_name")
    )


def enrich_nation_totals_streaming(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """B20+: the stream-static join under the micro-batch engine. The
    static dimensions are plain batch frames joined into the streaming
    plan; the paired test asserts the sink equals the registered batch
    query."""
    ev = streaming_events(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    enriched = ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey).join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    agg = enriched.groupBy("n_name").agg(
        F.count("*").alias("n_events"),
        (F.sum(_cents()).cast("double") / 100).alias("sum_value"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("enrich_nation_totals_streaming")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("enrich_nation_totals_streaming").orderBy("n_name")


# --------------------------------------------------------------------------
# B20+ — LEFT OUTER interval join: every purchase, attributed to its
# click count within the trailing 30 minutes — INCLUDING purchases with
# no qualifying click (the rows an inner join silently drops, and the
# rows a marketing funnel most wants to see). Batch query under the
# oracle; the paired runner executes the same join left-outer under the
# micro-batch engine, where watermarks on both sides bound the click
# state AND give the engine the completion point at which a NULL row may
# be emitted.
#
# Scale: equi-join on user_id with the time-range predicate evaluated
# inside the join; output is per-purchase (never a cross product); the
# aggregate is map-side combined.
# --------------------------------------------------------------------------
@_register(
    "stream_attribution_left_outer",
    f"""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           strftime(p.ts, '{_DUCK_FMT}') AS purchase_ts,
           COUNT(c.event_id) AS n_clicks_30m,
           COUNT(c.event_id) = 0 AS unattributed
    FROM events p LEFT JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id, p.ts
    ORDER BY purchase_id
    """,
)
def stream_attribution_left_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    )
    return (
        joined.groupBy("purchase_id", "user_id", "p_ts")
        .agg(F.count("click_id").alias("n_clicks_30m"))
        .select(
            "purchase_id",
            "user_id",
            F.date_format("p_ts", _FMT).alias("purchase_ts"),
            "n_clicks_30m",
            (F.col("n_clicks_30m") == 0).alias("unattributed"),
        )
        .orderBy("purchase_id")
    )


def attribution_left_outer_streaming(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """B20+: the left-outer interval join under the micro-batch engine.
    Watermarks on both sides are MANDATORY for outer interval joins —
    the engine can only emit the NULL (unmatched) row once the watermark
    proves no more qualifying clicks can arrive. Emits raw outer pairs;
    the per-purchase rollup happens at serving time (the paired test
    compares against the batch query's pair multiset)."""
    ev = streaming_events(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    ).select("purchase_id", "user_id", "click_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("attribution_left_outer_streaming")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("attribution_left_outer_streaming")


# --------------------------------------------------------------------------
# B23++ — transformWithStateInPandas (Spark 4's successor to
# applyInPandasWithState: named state variables on a processor handle —
# value/list/map state, timers, TTL — instead of one opaque state
# tuple). Per-user extremes (count, max cents, min cents) maintained in
# a ValueState across forced micro-batches; the last emission per user
# must equal the batch aggregate. The registered batch twin
# (stream_user_extremes) pins those semantics against the oracle; the
# runner's test asserts stream==batch and that state crossed batches.
#
# The extremes are ORDER-INSENSITIVE on purpose: rows within a
# micro-batch arrive partition-interleaved, so only commutative state
# merges yield deterministic emissions.
#
# Scale: state is one fixed-width row per user in RocksDB; the Arrow
# boundary carries (user_id, value) only. Same shuffle shape as a
# streaming hash aggregate.
# --------------------------------------------------------------------------
@_register(
    "stream_user_extremes",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           MAX(CAST(ROUND(value * 100, 0) AS BIGINT)) AS max_cents,
           MIN(CAST(ROUND(value * 100, 0) AS BIGINT)) AS min_cents
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stream_user_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max(_cents()).alias("max_cents"),
            F.min(_cents()).alias("min_cents"),
        )
        .orderBy("user_id")
    )


def user_extremes_transform_with_state(
    spark: SparkSession, sf_dir: str, n_chunks: int = 3
) -> DataFrame:
    """transformWithStateInPandas runner: per-user extremes across
    ``n_chunks`` forced micro-batches (maxFilesPerTrigger=1); memory
    sink in update mode, so each user emits once per batch that touched
    it and the LAST emission must equal the batch aggregate.

    Requires ``protobuf`` (the TWS state-server wire protocol is
    protobuf-based; Spark's driver-side TWS worker imports
    ``google.protobuf`` at query start). The dependency is gated here
    with a clear error — the test skips when it is absent — and the
    registered batch twin keeps the semantics under the oracle gate
    either way.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas needs the protobuf package "
            "(google.protobuf) for its state-server protocol; install "
            "protobuf to run this operator"
        ) from e
    import hashlib
    import os

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from iceberg_loader_spark.sources.tables import ensure_compat

    ensure_compat(spark)
    # transformWithState requires the RocksDB state store provider
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src = f"{sf_dir}/events.parquet"
    stage = (
        f"/tmp/ils_tws_{hashlib.md5(src.encode()).hexdigest()[:8]}"
        f"_{os.getpid()}"
    )
    if not os.path.isdir(stage):
        os.makedirs(stage, exist_ok=True)
        tab = pq.read_table(src, columns=["event_id", "user_id", "value"])
        pdf = tab.to_pandas()
        for i in range(n_chunks):
            pdf[pdf["event_id"] % n_chunks == i].to_parquet(
                f"{stage}/chunk{i}.parquet", index=False
            )

    class ExtremesProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "extremes", "n BIGINT, mx BIGINT, mn BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, mx, mn = self._state.get()
            else:
                n, mx, mn = 0, None, None
            for pdf in rows:
                x = pdf["value"].to_numpy() * 100
                cents = np.copysign(np.floor(np.abs(x) + 0.5), x).astype(
                    "int64"
                )
                n += len(cents)
                if len(cents):
                    bmax, bmin = int(cents.max()), int(cents.min())
                    mx = bmax if mx is None else max(mx, bmax)
                    mn = bmin if mn is None else min(mn, bmin)
            self._state.update((n, mx, mn))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "max_cents": [mx],
                    "min_cents": [mn],
                }
            )

        def close(self) -> None:
            pass

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("max_cents", LongType()),
            StructField("min_cents", LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    result = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ExtremesProcessor(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
    q = (
        result.writeStream.format("memory")
        .queryName("user_extremes_tws")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("user_extremes_tws")


# --------------------------------------------------------------------------
# Streaming sketch — Count-Min over the event stream's user_id traffic,
# audited against the exact top-10 (same 2x128 recipe as
# countmin_heavy_hitters on documents). The registered query is the
# batch twin; countmin_users_streaming maintains the SAME cells under
# the micro-batch engine — CM cells are pure sums, so any micro-batch
# slicing produces bit-identical cells (sketch additivity is what makes
# it streaming-safe; the paired test asserts equality).
#
# Scale: streaming state is the fixed 256-cell table regardless of
# stream volume — the canonical "heavy hitters over an unbounded
# stream in O(1) memory" construction.
# --------------------------------------------------------------------------
# Imported, not re-declared: the "same 2x128 recipe" relationship with
# countmin_heavy_hitters is structural — one hash function, one width.
from iceberg_loader_spark.operators.text import (  # noqa: E402
    _CM_SALTS as _CMU_SALTS,
    _DUCK_CM_BUCKET as _DUCK_CMU_BUCKET,
    _cm_bucket_col as _cmu_bucket,
)


def _cmu_cells(ev: DataFrame) -> DataFrame:
    """(r, b, c) Count-Min cell counts of the user_id column."""
    return (
        ev.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit(0).alias("r"),
                        _cmu_bucket(_CMU_SALTS[0], F.col("user_id")).alias("b"),
                    ),
                    F.struct(
                        F.lit(1).alias("r"),
                        _cmu_bucket(_CMU_SALTS[1], F.col("user_id")).alias("b"),
                    ),
                )
            ).alias("cell")
        )
        .groupBy("cell.r", "cell.b")
        .agg(F.count("*").alias("c"))
    )


def _cmu_report(cells: DataFrame, exact: DataFrame) -> DataFrame:
    """Join the exact top-10 against the sketch cells (both tiny)."""
    cand = (
        exact.orderBy(F.desc("exact_cnt"), F.asc("user_id"))
        .limit(10)
        .withColumn("b0", _cmu_bucket(_CMU_SALTS[0], F.col("user_id")))
        .withColumn("b1", _cmu_bucket(_CMU_SALTS[1], F.col("user_id")))
    )
    c0 = cells.filter(F.col("r") == 0).select(
        F.col("b").alias("b0"), F.col("c").alias("c0")
    )
    c1 = cells.filter(F.col("r") == 1).select(
        F.col("b").alias("b1"), F.col("c").alias("c1")
    )
    est = F.least(F.col("c0"), F.col("c1"))
    return (
        cand.join(F.broadcast(c0), "b0")
        .join(F.broadcast(c1), "b1")
        .select(
            "user_id",
            "exact_cnt",
            est.cast("bigint").alias("cm_est"),
            (est - F.col("exact_cnt")).cast("bigint").alias("est_err"),
            (est >= F.col("exact_cnt")).alias("overestimate_ok"),
        )
        .orderBy("user_id")
    )


@_register(
    "stream_countmin_users",
    f"""
    WITH cells AS (
      SELECT r, b, COUNT(*) AS c FROM (
        SELECT 0 AS r, {_DUCK_CMU_BUCKET.format(salt=_CMU_SALTS[0], key='user_id')} AS b FROM events
        UNION ALL
        SELECT 1 AS r, {_DUCK_CMU_BUCKET.format(salt=_CMU_SALTS[1], key='user_id')} AS b FROM events)
      GROUP BY r, b
    ),
    cand AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM events GROUP BY user_id
      ORDER BY exact_cnt DESC, user_id LIMIT 10
    )
    SELECT c.user_id, c.exact_cnt,
           CAST(LEAST(c0.c, c1.c) AS BIGINT) AS cm_est,
           CAST(LEAST(c0.c, c1.c) - c.exact_cnt AS BIGINT) AS est_err,
           LEAST(c0.c, c1.c) >= c.exact_cnt AS overestimate_ok
    FROM cand c
    JOIN cells c0 ON c0.r = 0
     AND c0.b = {_DUCK_CMU_BUCKET.format(salt=_CMU_SALTS[0], key='c.user_id')}
    JOIN cells c1 ON c1.r = 1
     AND c1.b = {_DUCK_CMU_BUCKET.format(salt=_CMU_SALTS[1], key='c.user_id')}
    ORDER BY user_id
    """,
)
def stream_countmin_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 event users audited against a 2x128 Count-Min sketch."""
    ev = load_table(spark, sf_dir, "events")
    cells = _cmu_cells(ev)
    exact = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("exact_cnt")
    )
    return _cmu_report(cells, exact)


def countmin_users_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same CM cells maintained by the micro-batch engine (complete
    mode; state = the fixed 256-cell table), then audited in batch.
    Cells are sums, so any micro-batch slicing yields the exact batch
    cells — the paired test asserts equality with the registered twin."""
    ev = streaming_events(spark, sf_dir)
    q = (
        _cmu_cells(ev)
        .writeStream.format("memory")
        .queryName("countmin_users_streaming_cells")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    cells = spark.table("countmin_users_streaming_cells")
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("exact_cnt"))
    )
    return _cmu_report(cells, exact)


def hll_users_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type HLL distinct-user sketches maintained by the micro-batch
    engine (complete mode). HLL insertion and union are commutative and
    lossless at equal lgK, so the streamed sketch's estimate must equal
    the batch sketch's bit-for-bit — the mergeability law that lets a
    stream keep exactly one fixed-size sketch per key at any volume.
    The paired test asserts equality against the batch spelling."""
    ev = streaming_events(spark, sf_dir)
    q = (
        ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(14))
            ).alias("est_users")
        )
        .writeStream.format("memory")
        .queryName("hll_users_streaming")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("hll_users_streaming").orderBy("event_type")


# --------------------------------------------------------------------------
# B20+ — FULL OUTER stream-stream interval join, completing the join-
# mode matrix (inner / left-outer / full-outer): every purchase keeps
# its click matches OR a NULL row, AND every click that attributed no
# purchase surfaces too (the "orphaned spend" side both one-sided joins
# drop). The registered query audits the three match categories; the
# micro-batch runner emits the same outer pair multiset under
# watermarks on both sides.
#
# Scale: state for both sides is bounded by (interval + watermark
# delay) per user key — the same state-retention math as the left-outer
# join, applied symmetrically.
# --------------------------------------------------------------------------
@_register(
    "stream_attribution_full_outer",
    """
    WITH pairs AS (
      SELECT p.event_id AS purchase_id, c.event_id AS click_id
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON c.user_id = p.user_id
       AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 30 MINUTE
    )
    SELECT CAST(SUM(CASE WHEN purchase_id IS NOT NULL
                          AND click_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS matched_pairs,
           CAST(SUM(CASE WHEN click_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS unattributed_purchases,
           CAST(SUM(CASE WHEN purchase_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS orphan_clicks
    FROM pairs
    """,
)
def stream_attribution_full_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Match-category audit of the purchases ⟗ clicks interval join."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        "full_outer",
    )
    both = F.col("purchase_id").isNotNull() & F.col("click_id").isNotNull()
    return joined.agg(
        F.sum(F.when(both, 1).otherwise(0)).cast("bigint").alias(
            "matched_pairs"
        ),
        F.sum(F.when(F.col("click_id").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("unattributed_purchases"),
        F.sum(F.when(F.col("purchase_id").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("orphan_clicks"),
    )


def attribution_full_outer_streaming(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full-outer interval join under the micro-batch engine —
    watermarks on BOTH sides gate both NULL emissions (an unmatched row
    on either side emits only once the other side's watermark proves no
    qualifying partner can arrive). The paired test compares the outer
    pair multiset against the batch query's."""
    ev = streaming_events(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        "fullOuter",
    ).select("purchase_id", "click_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("attribution_full_outer_streaming")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("attribution_full_outer_streaming")


# --------------------------------------------------------------------------
# B21+ — DYNAMIC-gap session window: the gap is a per-event expression
# (views cool off in 5 minutes, everything else in 30), Spark 3.2+'s
# session_window(ts, gap_column) form. Each event contributes the
# interval [ts, ts + its own gap]; overlapping intervals merge, so the
# oracle rebuilds sessions with the interval-merge island recipe — a
# running MAX of interval ends over strictly-preceding rows (the
# fixed-gap lag() trick is NOT sufficient: a long-gap event mid-session
# can extend the session past its successors' shorter gaps).
#
# Scale: same state-store shape as the fixed-gap session window — state
# keyed by user_id; gap choice is a per-row expression, no extra state.
# --------------------------------------------------------------------------
@_register(
    "stream_session_dynamic_gap",
    f"""
    WITH spans AS (
      SELECT user_id, ts, event_id,
             ts + CASE WHEN event_type = 'view'
                       THEN INTERVAL 5 MINUTE
                       ELSE INTERVAL 30 MINUTE END AS end_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, end_ts,
             CASE WHEN MAX(end_ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  >= ts THEN 0 ELSE 1 END AS new_session
      FROM spans
    ),
    sessions AS (
      SELECT user_id, ts, end_ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, end_ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '{_DUCK_FMT}') AS session_start,
           strftime(MAX(end_ts), '{_DUCK_FMT}') AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions under a per-event gap (view=5m, else 30m)."""
    ev = load_table(spark, sf_dir, "events")
    # session_window demands CalendarIntervalType — ANSI interval
    # literals are DayTimeIntervalType, so spell the gaps as strings
    gap = F.when(F.col("event_type") == "view", F.lit("5 minutes")).otherwise(
        F.lit("30 minutes")
    )
    agg = ev.groupBy("user_id", F.session_window("ts", gap)).agg(
        F.count("*").alias("n_events")
    )
    return agg.select(
        "user_id",
        F.date_format("session_window.start", _FMT).alias("session_start"),
        F.date_format("session_window.end", _FMT).alias("session_end"),
        "n_events",
    ).orderBy("user_id", "session_start")


def session_dynamic_gap_streaming(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """B21+ under the micro-batch engine: watermarked DYNAMIC-gap
    session windows (the same per-event gap expression as the batch
    twin). The paired test asserts equality with the registered query —
    session merging must be batch-invariant because the state store
    merges overlapping per-event intervals exactly as the batch
    analyzer does."""
    ev = streaming_events(spark, sf_dir).withWatermark("ts", "1 hour")
    gap = F.when(F.col("event_type") == "view", F.lit("5 minutes")).otherwise(
        F.lit("30 minutes")
    )
    agg = ev.groupBy("user_id", F.session_window("ts", gap)).agg(
        F.count("*").alias("n_events")
    )
    out = agg.select(
        "user_id",
        F.date_format("session_window.start", _FMT).alias("session_start"),
        F.date_format("session_window.end", _FMT).alias("session_end"),
        "n_events",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("session_dynamic_gap_streaming")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("session_dynamic_gap_streaming")
