"""HTTP catalog adapter: the full table commit protocol running against
an actual network service (in-process HTTP server) — proof the
MetadataBackend seam ports to a remote catalog, with the linearization
point server-side."""

from __future__ import annotations

import threading
import time

import pytest
from pyspark.sql import types as T

from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables.format import (
    CommitConflict,
    DataFile,
    new_snapshot,
)
from iceberg_loader_spark.tables.httpcatalog import (
    CatalogHTTPServer,
    HttpCatalogStore,
)
from iceberg_loader_spark.tables.objectstore import (
    ObjectStoreBackend,
    PreconditionFailed,
)
from iceberg_loader_spark.tables.table import Table


def _schema():
    return T.StructType([T.StructField("id", T.LongType())])


@pytest.fixture()
def server():
    srv = CatalogHTTPServer()
    with srv as url:
        yield url


def test_http_store_conditional_put_contract(server):
    store = HttpCatalogStore(server)
    etag = store.put("k", b"1", if_none_match=True)
    with pytest.raises(PreconditionFailed):
        store.put("k", b"2", if_none_match=True)
    with pytest.raises(PreconditionFailed):
        store.put("k", b"2", if_match="wrong")
    etag2 = store.put("k", b"2", if_match=etag)
    assert store.get("k") == (b"2", etag2)
    with pytest.raises(KeyError):
        store.get("absent")
    assert store.list_keys("k") == ["k"]
    store.delete("k")
    assert store.list_keys("") == []


def test_table_round_trip_over_http(spark, server, tmp_path):
    store = HttpCatalogStore(server)
    wh = Warehouse(
        str(tmp_path),
        backend_factory=lambda root: ObjectStoreBackend(store, root),
    )
    t = Table.create(wh, "db.t", _schema())
    t.append(spark.createDataFrame([(1,), (2,)], _schema()))
    t.append(spark.createDataFrame([(3,)], _schema()))
    t2 = wh.load_table("db.t")
    assert sorted(r.id for r in t2.scan(spark).collect()) == [1, 2, 3]
    assert t2.meta.current_version() == 3
    assert t2.scan(spark, version=2).count() == 2  # time travel over HTTP
    # a stale-parent commit loses server-side
    dup = new_snapshot(
        t2.snapshot(2), "append", _schema().jsonValue(), [], [], {}
    )
    with pytest.raises(CommitConflict):
        t2.meta.commit(dup, expected_parent=2)


def test_threaded_commit_race_over_http(server, tmp_path):
    """Two client threads race commits through the HTTP CAS; every commit
    must land exactly once with strictly linear versions — the
    linearization now happens in the SERVER, not in client-side locks."""
    store = HttpCatalogStore(server)
    wh = Warehouse(
        str(tmp_path),
        backend_factory=lambda root: ObjectStoreBackend(store, root),
    )
    Table.create(wh, "db.race", _schema())
    errors: list[Exception] = []

    def writer(wid: int):
        try:
            meta = wh.metadata("db.race")
            for i in range(5):
                for _ in range(200):
                    parent = meta.load_snapshot()
                    snap = new_snapshot(
                        parent,
                        "append",
                        parent.schema_json,
                        parent.partition_spec,
                        parent.files
                        + [
                            DataFile(
                                path=f"data/w{wid}_{i}.parquet",
                                rows=1,
                                bytes=1,
                            )
                        ],
                        parent.properties,
                    )
                    try:
                        meta.commit(snap, expected_parent=parent.version)
                        break
                    except CommitConflict:
                        time.sleep(0.001)
                else:  # pragma: no cover
                    raise RuntimeError(f"writer {wid} starved")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in (1, 2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=60)
    assert errors == []
    final = wh.metadata("db.race").load_snapshot()
    assert {f.path for f in final.files} == {
        f"data/w{w}_{i}.parquet" for w in (1, 2) for i in range(5)
    }
    assert final.version == 11
