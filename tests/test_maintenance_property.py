"""Property test for the maintenance procedures: ANY interleaving of
appends, copy-on-write deletes, manifest-chain squashes, position-delete
compactions, data-file rewrites, and snapshot expiry must leave the
table's visible content equal to a plain Python set model — and the
metadata procedures (`rewrite_manifests`, `rewrite_delete_files`) must
be PURE metadata: same content, same head version, resolvable manifests.

This is the mechanical form of the round-8 claims: manifest squashing
and delete-file merging are content-invariant under arbitrary commit
histories, not just the oracle queries' fixed scripts.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables.maintenance import (
    expire_snapshots,
    manifest_chain_length,
    rewrite_data_files,
    rewrite_delete_files,
    rewrite_manifests,
)
from iceberg_loader_spark.tables.table import Table

# ops: ("append", [v...]) adds rows with value v (id auto-increments so
# rows are unique); ("delete", t) removes v >= t copy-on-write;
# ("pos_delete", t) removes v >= t as a positional delete file;
# ("manifests",) squashes the chain; ("del_files",) merges pos deletes;
# ("compact",) rewrites data files; ("expire",) keeps last 2 snapshots.
_vals = st.lists(st.integers(0, 9), min_size=1, max_size=4)
_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), _vals),
        st.tuples(st.just("delete"), st.integers(3, 9)),
        st.tuples(st.just("pos_delete"), st.integers(3, 9)),
        st.tuples(st.just("manifests")),
        st.tuples(st.just("del_files")),
        st.tuples(st.just("compact")),
        st.tuples(st.just("expire")),
    ),
    min_size=2,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(first=_vals, ops=_ops)
def test_maintenance_ops_preserve_model_content(
    spark, tmp_path_factory, first, ops
):
    root = tmp_path_factory.mktemp("wh_prop")
    wh = Warehouse(str(root))
    df0 = spark.createDataFrame(
        [(0, int(first[0]))], "id bigint, v bigint"
    )
    t = Table.create(wh, "db.t", df0.schema)

    model: dict[int, int] = {}
    next_id = 0

    def _append(vals):
        nonlocal next_id
        rows = []
        for v in vals:
            rows.append((next_id, int(v)))
            model[next_id] = int(v)
            next_id += 1
        wh.load_table("db.t").append(
            spark.createDataFrame(rows, "id bigint, v bigint")
        )

    _append(first)
    for op in ops:
        t = wh.load_table("db.t")
        if op[0] == "append":
            _append(op[1])
        elif op[0] == "delete":
            t.delete_where(spark, f"v >= {op[1]}", mode="cow")
            for k in [k for k, v in model.items() if v >= op[1]]:
                del model[k]
        elif op[0] == "pos_delete":
            t.delete_where(spark, f"v >= {op[1]}", mode="mor-pos")
            for k in [k for k, v in model.items() if v >= op[1]]:
                del model[k]
        elif op[0] == "manifests":
            head = t.meta.current_version()
            rewrite_manifests(t)
            t2 = wh.load_table("db.t")
            assert t2.meta.current_version() == head, "metadata-only op committed"
            assert manifest_chain_length(t2) == 0
        elif op[0] == "del_files":
            rewrite_delete_files(t, spark)
            t2 = wh.load_table("db.t")
            pos = [
                d
                for d in t2.snapshot().delete_files
                if d.get("kind") == "pos"
            ]
            assert len(pos) <= 1, "merge must leave at most one pos file"
        elif op[0] == "compact":
            rewrite_data_files(t, spark, target_file_mb=512)
        elif op[0] == "expire":
            expire_snapshots(t, keep_last=2)
        # INVARIANT after every op: visible content == the Python model
        t = wh.load_table("db.t")
        got = {(r.id, r.v) for r in t.scan(spark).collect()}
        assert got == set(model.items()), f"drift after {op[0]}"
        # and the head manifest always resolves (chain never dangles)
        assert t.snapshot().version == t.meta.current_version()
