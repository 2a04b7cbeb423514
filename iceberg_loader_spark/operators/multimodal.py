"""Multimodal-column operators (SURVEY.md §2 B28).

Images/audio/video are carried as opaque ``binary`` payload columns with a
typed metadata struct — the Iceberg/parquet-native layout for multimodal
training data (payload stays a byte blob; metadata is queryable columns).
``decode_media`` is a real pure-Python codec for two containers — WAV
(RIFF chunk walk + PCM16 sample stats) and PPM P6 (header tokenizer +
RGB raster stats); other mimes raise ``NotImplementedError`` (codec
registry contract — a PNG/JPEG decode would slot into the same
``mapInPandas`` batch loop). ``fake_decode`` remains the byte-level
deterministic stand-in used by the feature-plumbing queries. Everything
Spark-side is real: schema, partitioning, Arrow-batched ``mapInPandas``
plumbing, batch shapes.

Payloads here are derived from ``documents.text`` (UTF-8 bytes) so every
byte-level derivation has an exact SQL oracle via the ASCII corpus.

Scale: payload stats are map-only over binary columns (no shuffle); frame
sampling streams Arrow batches through Python once, emitting fixed-size
frame rows — the mapInPandas stage is IO-shaped, not shuffle-shaped, and
column pruning still reaches the parquet scan for metadata-only queries.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
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


def _flatten_payloads(pdf: pd.DataFrame):
    """(flat_bytes, lens, starts) for a batch of binary payloads.

    One C-level ``b"".join`` concatenation + ``np.frombuffer`` view — no
    per-byte Python anywhere; per-row work is a single ``len()`` call.
    """
    payloads = pdf["payload"].tolist()
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
    flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens[:-1]))) if len(lens) else lens
    return flat, lens, starts


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched frame sampler: N evenly spaced bytes per payload.

    This is the real multimodal plumbing shape — video frame-sampling /
    audio windowing would replace the byte lookup with a codec call.
    Fully numpy-vectorized per Arrow batch: payloads are flattened into
    one uint8 buffer and the N offsets per document become one strided
    fancy-index gather — no per-row or per-frame Python loop.
    """
    for pdf in batches:
        flat, lens, starts = _flatten_payloads(pdf)
        n = len(lens)
        fi = np.tile(np.arange(_N_FRAMES, dtype=np.int64), n)
        lens_r = np.repeat(lens, _N_FRAMES)
        off = (fi * lens_r) // _N_FRAMES
        idx = np.repeat(starts, _N_FRAMES) + off
        valid = lens_r > 0
        vals = np.zeros(len(idx), dtype=np.int64)
        if flat.size:
            vals[valid] = flat[idx[valid]]
        yield pd.DataFrame(
            {
                "doc_id": np.repeat(pdf["doc_id"].to_numpy(np.int64), _N_FRAMES),
                "frame_idx": fi.astype(np.int32),
                "byte_offset": off,
                "byte_val": pd.Series(vals, dtype="int32").mask(~valid),
            }
        )


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
# Decode path. The real ``decode_media`` (pure-Python WAV/RIFF + PPM/P6
# codecs) is defined further down, next to the codecs it dispatches to.
# ``fake_decode`` remains for mimes with no in-container codec.
# --------------------------------------------------------------------------
def fake_decode(payload: bytes, mime: str) -> dict:
    """Deterministic stand-in for decode: byte-level pseudo-features."""
    buf = bytes(payload)
    return {
        "mime": mime,
        "n_bytes": len(buf),
        "checksum": sum(buf) % 65536,
        "head": buf[:4].hex(),
    }


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("checksum", IntegerType()),
        StructField("head_hex", StringType()),
    ]
)


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized batch equivalent of :func:`fake_decode`: per-document
    byte-sum checksum via one ``np.bincount`` over the flattened buffer,
    head bytes via slicing the same buffer. The production decode swaps
    the arithmetic for a codec call; batch flow and schema stay as-is."""
    for pdf in batches:
        flat, lens, starts = _flatten_payloads(pdf)
        n = len(lens)
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), lens)
        checksum = np.bincount(doc_rep, weights=flat, minlength=n).astype(
            np.int64
        ) % 65536
        heads = [
            flat[s : s + min(4, ln)].tobytes().hex()
            for s, ln in zip(starts.tolist(), lens.tolist())
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "mime": pdf["mime"],
                "n_bytes": lens.astype(np.int32),
                "checksum": checksum.astype(np.int32),
                "head_hex": pd.Series(heads, dtype=object),
            }
        )


# --------------------------------------------------------------------------
# B28 — decode features through mapInPandas: the end-to-end decode
# plumbing (payload + mime in, typed features out) with the deterministic
# stand-in where the codec would run. The oracle replays the byte math on
# the ASCII corpus.
# --------------------------------------------------------------------------
@_register(
    "multimodal_decode_features",
    """
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           CAST(list_sum(list_transform(range(1, octet_length(encode(text)) + 1),
                i -> ascii(substring(text, i, 1)))) % 65536 AS INTEGER) AS checksum,
           lower(hex(encode(substring(text, 1, 4)))) AS head_hex
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = with_payload(load_table(spark, sf_dir, "documents"))
    return (
        mm.select("doc_id", "payload", F.col("meta.mime").alias("mime"))
        .mapInPandas(_decode_batch, schema=_DECODE_SCHEMA)
        .orderBy("doc_id")
    )


_STRIDE = 8

_DOWNSAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", IntegerType()),
        StructField("checksum", IntegerType()),
        StructField("head_bytes", StringType()),
    ]
)


def _downsample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Every-``_STRIDE``-th-byte downsample — the 'resize' plumbing shape.

    An image resize / audio resample would replace the stride gather with
    a codec call; the Arrow batch flow and schema contract are what that
    production op uses. Numpy-vectorized per Arrow batch: one flattened
    uint8 buffer, one ragged strided fancy-index gather, ``np.bincount``
    for the per-document checksums — no per-row or per-byte Python.
    """
    for pdf in batches:
        flat, lens, starts = _flatten_payloads(pdf)
        n = len(lens)
        ns = (lens + _STRIDE - 1) // _STRIDE
        # Ragged gather: global sample index -> (owning doc, index within
        # that doc's stride sequence) via repeat/cumsum, then one fancy
        # index into the flat buffer.
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), ns)
        within = np.arange(len(doc_rep), dtype=np.int64) - np.repeat(
            np.cumsum(ns) - ns, ns
        )
        vals = (
            flat[starts[doc_rep] + within * _STRIDE]
            if flat.size
            else np.zeros(0, dtype=np.uint8)
        )
        checksum = np.bincount(doc_rep, weights=vals, minlength=n).astype(
            np.int64
        ) % 65536
        # head_bytes = first min(4, ns) samples per doc: 4 vectorized
        # gathers into an (n, 4) matrix, then per-row join into a
        # canonical comma-separated string (hashable downstream — array
        # columns break pandas-based result canonicalizers).
        head_n = np.minimum(ns, 4).astype(np.int64)
        mat = np.zeros((n, 4), dtype=np.int64)
        for k in range(4):
            has = ns > k
            if flat.size and has.any():
                mat[has, k] = flat[starts[has] + k * _STRIDE]
        heads = [
            ",".join(map(str, row[:c]))
            for row, c in zip(mat.tolist(), head_n.tolist())
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "n_samples": ns.astype(np.int32),
                "checksum": checksum.astype(np.int32),
                "head_bytes": pd.Series(heads, dtype=object),
            }
        )


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
           array_to_string(list_transform(range(0, least(4, n_samples)),
                i -> CAST(ascii(substring(text, i * {_STRIDE} + 1, 1)) AS INTEGER)),
                ',') AS head_bytes
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


_WIN = 64  # energy window width in bytes (the audio-frame stand-in)

_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_windows", IntegerType()),
        StructField("max_energy", LongType()),
        StructField("argmax_window", IntegerType()),
        StructField("total_energy", LongType()),
    ]
)


def _window_energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Windowed sum-of-squares energy per payload — the audio-RMS
    plumbing shape (an RMS/loudness pass would sqrt the same windows).

    Numpy-vectorized: one prefix-sum of squared bytes over the flat
    buffer; each window's energy is a difference of two prefix values —
    no per-window Python loop, no per-byte work after the single
    ``cumsum``. Ragged docs are handled by indexing window boundaries
    into the global prefix array.
    """
    for pdf in batches:
        flat, lens, starts = _flatten_payloads(pdf)
        n = len(lens)
        sq = flat.astype(np.int64) ** 2
        prefix = np.concatenate(([0], np.cumsum(sq)))
        n_wins = (lens + _WIN - 1) // _WIN
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), n_wins)
        within = np.arange(len(doc_rep), dtype=np.int64) - np.repeat(
            np.cumsum(n_wins) - n_wins, n_wins
        )
        w_start = starts[doc_rep] + within * _WIN
        w_end = np.minimum(w_start + _WIN, starts[doc_rep] + lens[doc_rep])
        energies = prefix[w_end] - prefix[w_start]
        # per-doc max / argmax / total via segmented reductions
        seg_bounds = np.concatenate(([0], np.cumsum(n_wins)))
        max_e = np.zeros(n, dtype=np.int64)
        arg_e = np.zeros(n, dtype=np.int64)
        tot_e = np.zeros(n, dtype=np.int64)
        if energies.size:
            tot_e = np.add.reduceat(energies, seg_bounds[:-1])
            max_e = np.maximum.reduceat(energies, seg_bounds[:-1])
            # first index achieving the max, per segment
            is_max = energies == max_e[doc_rep]
            first_idx = np.full(len(energies), np.iinfo(np.int64).max)
            first_idx[is_max] = within[is_max]
            arg_e = np.minimum.reduceat(first_idx, seg_bounds[:-1])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "n_windows": n_wins.astype(np.int32),
                "max_energy": max_e,
                "argmax_window": arg_e.astype(np.int32),
                "total_energy": tot_e,
            }
        )


# --------------------------------------------------------------------------
# B28 — windowed energy over the payload (the audio feature-extraction
# plumbing: fixed windows, per-window reduction, per-doc argmax). The
# oracle replays the byte math over the ASCII corpus.
# --------------------------------------------------------------------------
@_register(
    "multimodal_window_energy",
    f"""
    WITH d AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n,
             CAST((octet_length(encode(text)) + {_WIN - 1}) // {_WIN}
                  AS INTEGER) AS n_windows
      FROM documents
    ),
    w AS (
      SELECT doc_id, n_windows,
             list_transform(range(0, n_windows), i ->
               CAST(list_sum(list_transform(
                 range(i * {_WIN} + 1, least((i + 1) * {_WIN}, n) + 1),
                 j -> ascii(substring(text, j, 1))
                      * ascii(substring(text, j, 1)))) AS BIGINT))
               AS energies
      FROM d
    )
    SELECT doc_id, n_windows,
           CAST(list_max(energies) AS BIGINT) AS max_energy,
           CAST(list_position(energies, list_max(energies)) - 1 AS INTEGER)
             AS argmax_window,
           CAST(list_sum(energies) AS BIGINT) AS total_energy
    FROM w
    ORDER BY doc_id
    """,
)
def multimodal_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = with_payload(load_table(spark, sf_dir, "documents"))
    return (
        mm.select("doc_id", "payload")
        .mapInPandas(_window_energy, schema=_ENERGY_SCHEMA)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Real pure-Python codecs (round-5: replaces the decode_media stub).
#
# Two genuinely-parsed containers: WAV (RIFF chunk walk + PCM16 sample
# stats) and PPM (P6 header tokenizer + RGB raster stats). Containers are
# synthesized deterministically FROM document bytes, so every decoded
# scalar has an exact DuckDB arithmetic oracle over the ASCII corpus:
# wav sample[i] = (byte[i] - 128) * 256, ppm raster = bytes zero-padded
# to a 16-wide RGB grid.
# --------------------------------------------------------------------------
_WAV_RATE = 8000
_PPM_W = 16


def _encode_wav(data: bytes) -> bytes:
    """Build a real PCM16 mono RIFF/WAVE container from raw bytes."""
    import struct

    samples = ((np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) * 256
               ).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, _WAV_RATE, _WAV_RATE * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(samples)) + samples
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _encode_ppm(data: bytes) -> bytes:
    """Build a real binary PPM (P6) container: 16-wide RGB grid, raster =
    the input bytes zero-padded to width*height*3."""
    h = max(1, -(-len(data) // (_PPM_W * 3)))
    raster = data + b"\x00" * (_PPM_W * h * 3 - len(data))
    return b"P6\n%d %d\n255\n" % (_PPM_W, h) + raster


def _ppm_tokens(buf: bytes, start: int, count: int) -> tuple[list[int], int]:
    """Read ``count`` whitespace-separated ASCII integers from a PPM
    header, honoring ``#`` comment lines; returns (values, next_offset)."""
    vals: list[int] = []
    i = start
    while len(vals) < count:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if i < len(buf) and buf[i] == ord("#"):
            while i < len(buf) and buf[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < len(buf) and buf[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("malformed PPM header")
        vals.append(int(buf[i:j]))
        i = j
    return vals, i


def decode_media(payload: bytes, mime: str) -> dict:
    """Decode a media container into typed scalar features.

    Real pure-Python codecs (no external decode deps needed in this
    container): ``audio/wav`` walks RIFF chunks, validates the fmt chunk,
    and reduces the PCM16 samples; ``image/x-portable-pixmap`` parses the
    P6 header (whitespace + ``#``-comment tolerant) and reduces the RGB
    raster. Unsupported mimes raise ``NotImplementedError`` (codec
    registry contract); malformed payloads raise ``ValueError``.
    """
    import struct

    buf = bytes(payload)
    if mime == "audio/wav":
        if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE container")
        pos, fmt_info, data = 12, None, None
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            chunk = buf[pos + 8 : pos + 8 + size]
            if len(chunk) < size:
                raise ValueError(f"truncated {cid!r} chunk: {len(chunk)} < {size}")
            if cid == b"fmt ":
                if size < 16:
                    raise ValueError("fmt chunk too small")
                fmt_info = struct.unpack_from("<HHIIHH", chunk)
            elif cid == b"data":
                data = chunk
            pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
        if fmt_info is None or data is None:
            raise ValueError("missing fmt/data chunk")
        audio_fmt, channels, rate, _, _, bits = fmt_info
        if audio_fmt != 1 or bits != 16:
            raise ValueError(f"unsupported WAV encoding fmt={audio_fmt} bits={bits}")
        s = np.frombuffer(data, dtype="<i2").astype(np.int64)
        return {
            "format": "wav",
            "channels": int(channels),
            "sample_rate": int(rate),
            "bits": int(bits),
            "n_samples": int(s.size) // int(channels),
            "peak_abs": int(np.abs(s).max()) if s.size else 0,
            "dc_sum": int(s.sum()),
            "energy": int((s * s).sum()),
        }
    if mime == "image/x-portable-pixmap":
        if buf[:2] != b"P6":
            raise ValueError("not a P6 PPM")
        (w, h, maxval), off = _ppm_tokens(buf, 2, 3)
        off += 1  # exactly one whitespace byte after maxval per spec
        raster = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=off
                               ).astype(np.int64)
        return {
            "format": "ppm",
            "width": int(w),
            "height": int(h),
            "maxval": int(maxval),
            "n_pixels": int(w * h),
            "peak": int(raster.max()) if raster.size else 0,
            "pixel_sum": int(raster.sum()),
            "energy": int((raster * raster).sum()),
        }
    raise NotImplementedError(f"no codec available for {mime!r}")


_DECODE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_units", LongType()),
        StructField("meta_a", IntegerType()),
        StructField("meta_b", IntegerType()),
        StructField("peak", LongType()),
        StructField("signal_sum", LongType()),
        StructField("energy", LongType()),
    ]
)


def _decode_stats_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encode each payload into a real WAV and a real PPM container, then
    round-trip through :func:`decode_media`. Per-container Python is the
    codec contract (real codecs decode one container at a time); the
    sample math inside each decode is numpy-vectorized, and the batch
    flow is Arrow end-to-end."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"].tolist(), pdf["payload"].tolist()):
            w = decode_media(_encode_wav(payload), "audio/wav")
            rows.append((doc_id, "audio/wav", w["n_samples"], w["sample_rate"],
                         w["bits"], w["peak_abs"], w["dc_sum"], w["energy"]))
            p = decode_media(_encode_ppm(payload), "image/x-portable-pixmap")
            rows.append((doc_id, "image/x-portable-pixmap", p["n_pixels"],
                         p["width"], p["height"], p["peak"], p["pixel_sum"],
                         p["energy"]))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "mime", "n_units", "meta_a", "meta_b", "peak",
                     "signal_sum", "energy"],
        )


# --------------------------------------------------------------------------
# B28 — real container decode: synthesize WAV + PPM from document bytes,
# parse them back with the pure-Python codecs, emit decoded scalars. The
# oracle replays the decoded arithmetic directly over the ASCII corpus
# (wav sample = (byte-128)*256; ppm raster = bytes zero-padded to 16×H×3).
# Scale: map-only over the payload column — no shuffle; the sort is the
# gate's determinism requirement, not part of the operator.
# --------------------------------------------------------------------------
@_register(
    "multimodal_decode_stats",
    f"""
    WITH d AS (
      SELECT doc_id, octet_length(encode(text)) AS n,
             list_transform(range(1, octet_length(encode(text)) + 1),
                            i -> ascii(substring(text, i, 1))) AS bytes
      FROM documents
    )
    SELECT doc_id, 'audio/wav' AS mime,
           CAST(n AS BIGINT) AS n_units,
           {_WAV_RATE} AS meta_a, 16 AS meta_b,
           CAST(256 * COALESCE(list_max(list_transform(bytes,
                b -> abs(b - 128))), 0) AS BIGINT) AS peak,
           CAST(256 * (CAST(list_sum(bytes) AS BIGINT) - 128 * n)
                AS BIGINT) AS signal_sum,
           CAST(65536 * CAST(list_sum(list_transform(bytes,
                b -> (b - 128) * (b - 128))) AS BIGINT) AS BIGINT) AS energy
    FROM d
    UNION ALL
    SELECT doc_id, 'image/x-portable-pixmap' AS mime,
           CAST({_PPM_W} * greatest(1, (n + {_PPM_W * 3 - 1}) // {_PPM_W * 3})
                AS BIGINT) AS n_units,
           {_PPM_W} AS meta_a,
           CAST(greatest(1, (n + {_PPM_W * 3 - 1}) // {_PPM_W * 3})
                AS INTEGER) AS meta_b,
           CAST(COALESCE(list_max(bytes), 0) AS BIGINT) AS peak,
           CAST(list_sum(bytes) AS BIGINT) AS signal_sum,
           CAST(list_sum(list_transform(bytes, b -> b * b)) AS BIGINT) AS energy
    FROM d
    ORDER BY doc_id, mime
    """,
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = with_payload(load_table(spark, sf_dir, "documents"))
    return (
        mm.select("doc_id", "payload")
        .mapInPandas(_decode_stats_batch, schema=_DECODE_STATS_SCHEMA)
        .orderBy("doc_id", "mime")
    )


# --------------------------------------------------------------------------
# Round 6 — image RESIZE through the real codec: encode each payload as
# a genuine P6 PPM container, decode it back with the same header
# parser the decode-stats operator uses (a true codec ROUND-TRIP — any
# header/raster bug breaks the numbers), then nearest-neighbor
# downsample the RGB raster 2× in both axes (`raster[::2, ::2, :]` —
# the resize kernel a thumbnail/feature-extraction pipeline runs) and
# emit exact integer reductions of the RESIZED raster, including an
# order-weighted checksum so a transposed or off-by-one-sampled resize
# cannot hash-match. Oracle replays the byte geometry arithmetically:
# sampled source index for resized element i is
# ((i div 24)·2·16 + ((i mod 24) div 3)·2)·3 + (i mod 3) + 1.
#
# Scale: Arrow-batched mapInPandas, vectorized numpy inside — map-only,
# no shuffle; the per-row work is O(raster), the thumbnail shape.
# --------------------------------------------------------------------------
_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("new_w", LongType()),
        StructField("new_h", LongType()),
        StructField("resized_sum", LongType()),
        StructField("resized_peak", LongType()),
        StructField("checksum", LongType()),
    ]
)


def _resize_stats_batch(batches):
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            ppm = _encode_ppm(bytes(payload))
            # decode through the REAL parser (roundtrip, not a shortcut)
            (w, h, _maxval), off = _ppm_tokens(ppm, 2, 3)
            off += 1
            raster = np.frombuffer(
                ppm, dtype=np.uint8, count=w * h * 3, offset=off
            ).astype(np.int64).reshape(h, w, 3)
            rz = raster[::2, ::2, :]
            flat = rz.reshape(-1)
            idx = np.arange(flat.size, dtype=np.int64)
            rows.append(
                (
                    int(doc_id),
                    int(w),
                    int(h),
                    int(rz.shape[1]),
                    int(rz.shape[0]),
                    int(flat.sum()),
                    int(flat.max()) if flat.size else 0,
                    int((idx * flat).sum()),
                )
            )
        yield pd.DataFrame(
            rows, columns=[f.name for f in _RESIZE_SCHEMA.fields]
        )


@_register(
    "multimodal_image_resize_stats",
    f"""
    WITH d AS (
      SELECT doc_id, octet_length(encode(text)) AS n,
             list_transform(range(1, octet_length(encode(text)) + 1),
                            i -> ascii(substring(text, i, 1))) AS bytes
      FROM documents
    ),
    g AS (
      SELECT doc_id, n, bytes,
             greatest(1, (n + {_PPM_W * 3 - 1}) // {_PPM_W * 3}) AS h
      FROM d
    ),
    r AS (SELECT *, (h + 1) // 2 AS new_h FROM g),
    v AS (
      SELECT doc_id, h, new_h,
             list_transform(range(0, new_h * {(_PPM_W // 2) * 3}),
               i -> CASE WHEN ((i // {(_PPM_W // 2) * 3}) * 2 * {_PPM_W}
                              + ((i % {(_PPM_W // 2) * 3}) // 3) * 2) * 3
                              + (i % 3) + 1 <= n
                    THEN bytes[((i // {(_PPM_W // 2) * 3}) * 2 * {_PPM_W}
                              + ((i % {(_PPM_W // 2) * 3}) // 3) * 2) * 3
                              + (i % 3) + 1]
                    ELSE 0 END) AS vals
      FROM r
    )
    SELECT doc_id,
           CAST({_PPM_W} AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST({_PPM_W // 2} AS BIGINT) AS new_w,
           CAST(new_h AS BIGINT) AS new_h,
           CAST(list_sum(vals) AS BIGINT) AS resized_sum,
           CAST(COALESCE(list_max(vals), 0) AS BIGINT) AS resized_peak,
           CAST(list_sum(list_transform(range(1, len(vals) + 1),
                i -> (i - 1) * vals[i])) AS BIGINT) AS checksum
    FROM v
    ORDER BY doc_id
    """,
)
def multimodal_image_resize_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    mm = with_payload(load_table(spark, sf_dir, "documents"))
    return (
        mm.select("doc_id", "payload")
        .mapInPandas(_resize_stats_batch, schema=_RESIZE_SCHEMA)
        .orderBy("doc_id")
    )
