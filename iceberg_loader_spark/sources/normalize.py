"""Messy-dict → Arrow normalization (the reference's headline feature).

Behavior parity with ``/root/reference src/iceberg_loader/utils/arrow.py``:

* key union across all rows, first-seen order (arrow.py:26-31)
* dict/list values → compact JSON strings: ``json.dumps(...,
  ensure_ascii=False, separators=(',',':'))`` (arrow.py:12, 58-59) —
  golden outputs ``'{"a":1,"b":"x"}'``, ``'[1,2,3]'``
  (tests/test_arrow_utils.py:34-43)
* per-column Arrow inference; on failure every scalar is stringified
  (arrow.py:39-42)
* all-null columns land as string (arrow.py:65-67)
* ``create_record_batches_from_dicts`` chunks an iterator into batches of
  ``batch_size`` (default 10 000, arrow.py:137-156)
* ``cast_to_schema``: reorder to target, fill missing with NULL, cast
  safe→unsafe→NULL-column-with-warning (arrow.py:75-134)
"""

from __future__ import annotations

import json
import logging
from collections.abc import Iterable, Iterator

import pyarrow as pa

log = logging.getLogger(__name__)


def json_serialize(value) -> str:
    """Compact JSON — byte-exact with the reference (arrow.py:12)."""
    return json.dumps(value, ensure_ascii=False, separators=(",", ":"))


def _normalize_value(v):
    if isinstance(v, (dict, list)):
        return json_serialize(v)
    return v


def create_arrow_table_from_data(data: list[dict]) -> pa.Table:
    """Union-of-keys dict rows → Arrow table (arrow.py:19-72)."""
    if not data:
        raise ValueError("no rows to convert")
    keys: list[str] = []
    seen = set()
    for row in data:
        for k in row:
            if k not in seen:
                seen.add(k)
                keys.append(k)
    arrays, fields = [], []
    for k in keys:
        values = [_normalize_value(row.get(k)) for row in data]
        try:
            arr = pa.array(values)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            # mixed incompatible scalars → stringify (arrow.py:39-42)
            arr = pa.array([None if v is None else str(v) for v in values])
        if pa.types.is_null(arr.type):
            arr = arr.cast(pa.string())  # all-null → string (arrow.py:65-67)
        arrays.append(arr)
        fields.append(pa.field(k, arr.type, nullable=True))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def create_record_batches_from_dicts(
    data_iterator: Iterable[dict], batch_size: int = 10000
) -> Iterator[pa.RecordBatch]:
    """Chunk dict rows into RecordBatches (arrow.py:137-156)."""
    chunk: list[dict] = []
    for row in data_iterator:
        chunk.append(row)
        if len(chunk) >= batch_size:
            for b in create_arrow_table_from_data(chunk).to_batches():
                yield b
            chunk = []
    if chunk:
        for b in create_arrow_table_from_data(chunk).to_batches():
            yield b


def convert_column_type(column: pa.ChunkedArray | pa.Array, target: pa.DataType):
    """safe cast → unsafe cast → NULL column + warning (arrow.py:75-102)."""
    if column.type == target:
        return column
    try:
        return column.cast(target, safe=True)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
        pass
    try:
        return column.cast(target, safe=False)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
        log.warning(
            "cast to %s failed for column of type %s; filling with NULLs",
            target,
            column.type,
        )
        return pa.nulls(len(column), type=target)


def cast_to_schema(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Reorder/cast to target schema; missing columns → NULL (arrow.py:105-134)."""
    if table.schema == target:
        return table
    arrays = []
    for f in target:
        if f.name in table.column_names:
            arrays.append(convert_column_type(table.column(f.name), f.type))
        else:
            arrays.append(pa.nulls(table.num_rows, type=f.type))
    return pa.Table.from_arrays(
        [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrays],
        schema=target,
    )
