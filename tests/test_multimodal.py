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


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x89PNG", "image/png")


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
