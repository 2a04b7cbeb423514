"""B28 multimodal plumbing: layout, mapInPandas batch shape, decode stubs."""

from __future__ import annotations

import pytest

from iceberg_loader_spark.operators import multimodal as mm
from iceberg_loader_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_payload_layout(spark):
    df = mm.with_payload(load_table(spark, SF_SMOKE, "documents"))
    dtypes = dict(df.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["meta"].startswith("struct<mime:string,n_bytes:int")
    row = df.orderBy("doc_id").first()
    assert bytes(row.payload).decode("utf-8")  # round-trips as utf-8
    assert row.meta.n_bytes == len(bytes(row.payload))


def test_frame_sample_shape(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    n_docs = docs.count()
    frames = mm.multimodal_frame_sample(spark, SF_SMOKE)
    assert frames.count() == n_docs * 4
    first = frames.filter("doc_id = 0").collect()
    assert [f.frame_idx for f in first] == [0, 1, 2, 3]
    assert first[0].byte_offset == 0


def test_decode_media_unsupported_mime():
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x89PNG", "image/png")


def test_decode_media_wav_roundtrip():
    data = bytes(range(200, 256)) + b"\x00\x80hello"
    wav = mm._encode_wav(data)
    got = mm.decode_media(wav, "audio/wav")
    samples = [(b - 128) * 256 for b in data]
    assert got["format"] == "wav"
    assert got["sample_rate"] == mm._WAV_RATE
    assert got["channels"] == 1 and got["bits"] == 16
    assert got["n_samples"] == len(data)
    assert got["peak_abs"] == max(abs(s) for s in samples)
    assert got["dc_sum"] == sum(samples)
    assert got["energy"] == sum(s * s for s in samples)


def test_decode_media_wav_walks_unknown_chunks():
    """A real RIFF parser must skip chunks it doesn't know (and honor the
    2-byte alignment rule), not assume fmt/data adjacency."""
    import struct

    wav = bytearray(mm._encode_wav(b"abc"))
    # splice an unknown odd-sized chunk between WAVE and fmt
    extra = b"LIST" + struct.pack("<I", 3) + b"xyz" + b"\x00"  # pad byte
    out = bytes(wav[:12]) + extra + bytes(wav[12:])
    out = out[:4] + struct.pack("<I", len(out) - 8) + out[8:]
    got = mm.decode_media(out, "audio/wav")
    assert got["n_samples"] == 3


def test_decode_media_wav_malformed():
    with pytest.raises(ValueError):
        mm.decode_media(b"RIFFxxxxNOPE", "audio/wav")
    with pytest.raises(ValueError):
        mm.decode_media(mm._encode_wav(b"abc")[:20], "audio/wav")


def test_decode_media_ppm_roundtrip():
    data = b"The quick brown fox jumps over the lazy dog" * 3
    ppm = mm._encode_ppm(data)
    got = mm.decode_media(ppm, "image/x-portable-pixmap")
    h = max(1, -(-len(data) // (mm._PPM_W * 3)))
    assert got["format"] == "ppm"
    assert (got["width"], got["height"], got["maxval"]) == (mm._PPM_W, h, 255)
    assert got["n_pixels"] == mm._PPM_W * h
    assert got["peak"] == max(data)
    assert got["pixel_sum"] == sum(data)
    assert got["energy"] == sum(b * b for b in data)


def test_decode_media_ppm_comment_tolerant_header():
    raster = bytes(range(48))
    ppm = b"P6\n# a comment line\n16 1\n# another\n255\n" + raster
    got = mm.decode_media(ppm, "image/x-portable-pixmap")
    assert (got["width"], got["height"]) == (16, 1)
    assert got["pixel_sum"] == sum(raster)


def test_decode_media_ppm_malformed():
    with pytest.raises(ValueError):
        mm.decode_media(b"P5\n16 1\n255\n" + b"\x00" * 48, "image/x-portable-pixmap")


def test_fake_decode_deterministic():
    a = mm.fake_decode(b"hello world", "audio/wav")
    b = mm.fake_decode(b"hello world", "audio/wav")
    assert a == b
    assert a["n_bytes"] == 11
    assert a["head"] == b"hell".hex()


def test_decode_features_match_fake_decode_rowwise(spark):
    """The vectorized batch decode must agree with the scalar
    fake_decode contract on every row."""
    from tests.conftest import SF_SMOKE

    import __spark_entry__ as entrymod

    rows = (
        entrymod.queries()["multimodal_decode_features"](spark, SF_SMOKE)
        .limit(50)
        .collect()
    )
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
        .collect()
    }
    checked = 0
    for r in rows:
        if r.doc_id not in docs:
            continue
        want = mm.fake_decode(docs[r.doc_id].encode(), "text/plain")
        assert r.n_bytes == want["n_bytes"]
        assert r.checksum == want["checksum"]
        assert r.head_hex == want["head"]
        checked += 1
    assert checked > 0


def test_image_resize_roundtrip_matches_numpy_reference():
    """The resize operator's per-row math: encode→decode roundtrip then
    raster[::2, ::2, :] — checked against a hand-built reference."""
    import numpy as np
    import pandas as pd

    data = bytes(range(1, 100))  # 99 bytes → h = ceil(99/48) = 3
    pdf = pd.DataFrame({"doc_id": [7], "payload": [data]})
    out = next(mm._resize_stats_batch(iter([pdf])))
    row = out.iloc[0]
    raster = np.zeros((3, 16, 3), dtype=np.int64)
    raster.reshape(-1)[: len(data)] = np.frombuffer(data, dtype=np.uint8)
    rz = raster[::2, ::2, :]
    flat = rz.reshape(-1)
    assert (row.width, row.height, row.new_w, row.new_h) == (16, 3, 8, 2)
    assert row.resized_sum == flat.sum()
    assert row.resized_peak == flat.max()
    assert row.checksum == (np.arange(flat.size) * flat).sum()


def test_image_resize_empty_payload():
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": [1], "payload": [b""]})
    row = next(mm._resize_stats_batch(iter([pdf]))).iloc[0]
    # empty payload still yields one 16x1 black image → 8x1 resized zeros
    assert (row.height, row.new_h, row.resized_sum, row.resized_peak) == (
        1, 1, 0, 0,
    )
