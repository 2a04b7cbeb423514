"""Messy-JSON normalization goldens (reference tests/test_arrow_utils.py)."""

import pyarrow as pa

from iceberg_loader_spark.sources.normalize import (
    cast_to_schema,
    convert_column_type,
    create_arrow_table_from_data,
    create_record_batches_from_dicts,
)


def test_messy_json_golden_strings():
    """Golden outputs from reference tests/test_arrow_utils.py:34-43."""
    data = [
        {"id": 1, "complex_field": {"a": 1, "b": "x"}},
        {"id": 2, "complex_field": {"a": 2, "b": "y", "c": True}},
        {"id": 3, "complex_field": [1, 2, 3]},
    ]
    t = create_arrow_table_from_data(data)
    col = t.column("complex_field").to_pylist()
    assert col == ['{"a":1,"b":"x"}', '{"a":2,"b":"y","c":true}', "[1,2,3]"]
    assert t.column("id").to_pylist() == [1, 2, 3]


def test_unicode_not_escaped():
    t = create_arrow_table_from_data([{"j": {"k": "héllo"}}])
    assert t.column("j").to_pylist() == ['{"k":"héllo"}']


def test_key_union_and_null_fill():
    data = [{"a": 1}, {"b": "x"}]
    t = create_arrow_table_from_data(data)
    assert t.column_names == ["a", "b"]
    assert t.column("a").to_pylist() == [1, None]
    assert t.column("b").to_pylist() == [None, "x"]


def test_all_null_column_is_string():
    t = create_arrow_table_from_data([{"a": None}, {"a": None}])
    assert t.schema.field("a").type == pa.string()


def test_mixed_scalars_stringified():
    t = create_arrow_table_from_data([{"a": 1}, {"a": "x"}])
    assert t.column("a").to_pylist() == ["1", "x"]


def test_empty_input_returns_empty_table():
    """Reference parity (arrow.py:20-23, test_arrow_utils.py:26-31):
    [] -> a 0-row, 0-column table, not an error."""
    t = create_arrow_table_from_data([])
    assert t.num_rows == 0
    assert t.num_columns == 0


def test_scalar_typing_contract():
    """A4 scalar-typing contract, pinned both ways.

    Default (typed inference — our documented divergence): {'id': 1}
    keeps id as int64. With stringify_scalars=True we reproduce the
    reference exactly (verified by executing reference arrow.py:45-62:
    {'id': 1} yields id: string = '1'; bools become 'True'/'False';
    dict/list values stay compact JSON either way)."""
    data = [{"id": 1, "ok": True, "j": {"a": 1}}, {"id": 2, "ok": False}]

    typed = create_arrow_table_from_data(data)
    assert typed.schema.field("id").type == pa.int64()
    assert typed.schema.field("ok").type == pa.bool_()
    assert typed.column("j").to_pylist() == ['{"a":1}', None]

    compat = create_arrow_table_from_data(data, stringify_scalars=True)
    assert compat.schema.field("id").type == pa.string()
    assert compat.column("id").to_pylist() == ["1", "2"]
    assert compat.column("ok").to_pylist() == ["True", "False"]
    assert compat.column("j").to_pylist() == ['{"a":1}', None]


def test_stringify_scalars_through_batch_iterator():
    batches = list(
        create_record_batches_from_dicts(
            ({"i": i} for i in range(5)), 2, stringify_scalars=True
        )
    )
    assert [b.column("i").to_pylist() for b in batches] == [
        ["0", "1"],
        ["2", "3"],
        ["4"],
    ]


def test_batching_sizes():
    batches = list(create_record_batches_from_dicts(({"i": i} for i in range(25)), 10))
    assert [len(b) for b in batches] == [10, 10, 5]


def test_cast_failure_yields_null_column():
    col = pa.chunked_array([pa.array(["x", "y"])])
    out = convert_column_type(col, pa.int64())
    assert out.to_pylist() == [None, None]
    assert out.type == pa.int64()


def test_cast_to_schema_fills_missing_with_null():
    t = pa.table({"a": [1, 2]})
    target = pa.schema([pa.field("a", pa.int64()), pa.field("b", pa.string())])
    out = cast_to_schema(t, target)
    assert out.column("b").to_pylist() == [None, None]
    assert out.schema.names == ["a", "b"]
