"""Multimodal-column operators (SURVEY.md §2 B28).

Images/audio/video are carried as opaque ``binary`` payload columns with a
typed metadata struct — the Iceberg/parquet-native layout for multimodal
training data (payload stays a byte blob; metadata is queryable columns).
The container has no image/audio codecs, so the *decode* step is stubbed
(``decode_media`` raises ``NotImplementedError``; ``fake_decode`` is the
deterministic stand-in) while everything Spark-side is real: schema,
partitioning, Arrow-batched ``mapInPandas`` plumbing, batch shapes.

Payloads here are derived from ``documents.text`` (UTF-8 bytes) so every
byte-level derivation has an exact SQL oracle via the ASCII corpus.

Scale: payload stats are map-only over binary columns (no shuffle); frame
sampling streams Arrow batches through Python once, emitting fixed-size
frame rows — the mapInPandas stage is IO-shaped, not shuffle-shaped, and
column pruning still reaches the parquet scan for metadata-only queries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

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


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the multimodal layout: binary payload + metadata struct."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col("text")).alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


# --------------------------------------------------------------------------
# B28 — payload + metadata scan: checksum, sizes, head byte. Pure map over
# the binary column; the md5 is computed on payload *bytes* (== utf8 text
# on this corpus, which is what the VARCHAR oracle hashes).
# --------------------------------------------------------------------------
@_register(
    "multimodal_payload_stats",
    """
    SELECT doc_id,
           'text/plain' AS mime,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5,
           ascii(substring(text, 1, 1)) AS head_byte,
           lang
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = with_payload(load_table(spark, sf_dir, "documents"))
    return mm.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.ascii(F.col("payload").cast("string")).alias("head_byte"),
        F.col("meta.lang").alias("lang"),
    ).orderBy("doc_id")


_N_FRAMES = 4

_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("byte_offset", LongType()),
        StructField("byte_val", IntegerType()),
    ]
)


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched frame sampler: N evenly spaced bytes per payload.

    This is the real multimodal plumbing shape — video frame-sampling /
    audio windowing would replace the byte lookup with a codec call.
    """
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [],
            "frame_idx": [],
            "byte_offset": [],
            "byte_val": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            buf = bytes(payload)
            n = len(buf)
            for i in range(_N_FRAMES):
                off = (i * n) // _N_FRAMES
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["byte_offset"].append(off)
                out["byte_val"].append(buf[off] if n else None)
        yield pd.DataFrame(out)


# --------------------------------------------------------------------------
# B28 — frame sampling through mapInPandas (Arrow batch transfer). The
# oracle replays the byte math on the ASCII corpus with 1-based substring.
# --------------------------------------------------------------------------
@_register(
    "multimodal_frame_sample",
    f"""
    SELECT doc_id,
           frame_idx,
           (frame_idx * octet_length(encode(text))) // {_N_FRAMES} AS byte_offset,
           ascii(substring(text,
                 ((frame_idx * octet_length(encode(text))) // {_N_FRAMES}) + 1,
                 1)) AS byte_val
    FROM documents, (SELECT unnest(range({_N_FRAMES})) AS frame_idx)
    ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = with_payload(load_table(spark, sf_dir, "documents"))
    frames = mm.select("doc_id", "payload").mapInPandas(
        _sample_frames, schema=_FRAME_SCHEMA
    )
    return frames.orderBy("doc_id", "frame_idx")


# --------------------------------------------------------------------------
# Decode stubs — the plumbing contract for real codecs.
# --------------------------------------------------------------------------
def decode_media(payload: bytes, mime: str):
    """Decode an image/audio/video payload. STUB: no codecs in container.

    The production implementation would dispatch on ``mime`` to
    PIL/libav/etc. inside the same mapInPandas batch loop used by
    :func:`_sample_frames`.
    """
    raise NotImplementedError(
        f"no codec available for {mime!r}; install decode deps"
    )


def fake_decode(payload: bytes, mime: str) -> dict:
    """Deterministic stand-in for decode: byte-level pseudo-features."""
    buf = bytes(payload)
    return {
        "mime": mime,
        "n_bytes": len(buf),
        "checksum": sum(buf) % 65536,
        "head": buf[:4].hex(),
    }


_STRIDE = 8

_DOWNSAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", IntegerType()),
        StructField("checksum", IntegerType()),
        StructField("head_bytes", ArrayType(IntegerType())),
    ]
)


def _downsample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Every-``_STRIDE``-th-byte downsample — the 'resize' plumbing shape.

    An image resize / audio resample would replace the stride slice with a
    codec call; the Arrow batch flow, schema contract, and per-row loop
    are exactly what that production op uses.
    """
    for pdf in batches:
        out = {"doc_id": [], "n_samples": [], "checksum": [], "head_bytes": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            buf = bytes(payload)
            sampled = buf[:: _STRIDE]
            out["doc_id"].append(doc_id)
            out["n_samples"].append(len(sampled))
            out["checksum"].append(sum(sampled) % 65536)
            out["head_bytes"].append([int(b) for b in sampled[:4]])
        yield pd.DataFrame(out)


# --------------------------------------------------------------------------
# B28 — stride downsample ("resize") through mapInPandas; the oracle
# replays the byte math via 1-based substring over the ASCII corpus.
# --------------------------------------------------------------------------
@_register(
    "multimodal_downsample",
    f"""
    WITH d AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n,
             (octet_length(encode(text)) + {_STRIDE - 1}) // {_STRIDE} AS n_samples
      FROM documents
    )
    SELECT doc_id,
           CAST(n_samples AS INTEGER) AS n_samples,
           CAST(list_sum(list_transform(range(0, n_samples),
                i -> ascii(substring(text, i * {_STRIDE} + 1, 1)))) % 65536
                AS INTEGER) AS checksum,
           list_transform(range(0, least(4, n_samples)),
                i -> CAST(ascii(substring(text, i * {_STRIDE} + 1, 1)) AS INTEGER))
             AS head_bytes
    FROM d
    ORDER BY doc_id
    """,
)
def multimodal_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = with_payload(load_table(spark, sf_dir, "documents"))
    return (
        mm.select("doc_id", "payload")
        .mapInPandas(_downsample, schema=_DOWNSAMPLE_SCHEMA)
        .orderBy("doc_id")
    )
