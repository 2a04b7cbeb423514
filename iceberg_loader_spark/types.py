"""Bidirectional Arrow ↔ Spark type registry.

Mirrors the reference's Arrow↔Iceberg ``TypeRegistry``
(``/root/reference src/iceberg_loader/utils/types.py:24-86``), with the
Spark equivalents from SURVEY.md §1.2:

* ints ≤32 bit → IntegerType; 33-64 bit signed → LongType
* uint64 → DecimalType(20,0) (doesn't fit a signed long)
* naive timestamps (any unit) → TimestampNTZType (µs precision)
* tz-aware timestamps → TimestampType (session TZ pinned UTC)
* all-null columns → StringType
* decimals preserved; anything else (durations, nested) → ValueError
* ``register_custom_mapping`` — user-pluggable hook (types.py:56-57)
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T

_CUSTOM: dict[pa.DataType, T.DataType] = {}


def register_custom_mapping(arrow_type: pa.DataType, spark_type: T.DataType) -> None:
    """Register a user-defined Arrow→Spark mapping (reference types.py:119-120)."""
    _CUSTOM[arrow_type] = spark_type


class UnsupportedTypeError(ValueError):
    pass


def arrow_to_spark(t: pa.DataType) -> T.DataType:
    """Map one Arrow type to its Spark storage type; raise if unsupported."""
    if t in _CUSTOM:
        return _CUSTOM[t]
    if pa.types.is_null(t):
        return T.StringType()
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return T.StringType()
    if pa.types.is_boolean(t):
        return T.BooleanType()
    if pa.types.is_integer(t):
        if t == pa.uint64():
            return T.DecimalType(20, 0)
        bits = t.bit_width
        if bits <= 32 and not (t == pa.uint32()):
            return T.IntegerType()
        return T.LongType()  # int64, uint32, …
    if pa.types.is_float32(t):
        return T.FloatType()
    if pa.types.is_float64(t):
        return T.DoubleType()
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return T.BinaryType()
    if pa.types.is_date(t):
        return T.DateType()
    if pa.types.is_timestamp(t):
        if t.tz is None:
            return T.TimestampNTZType()
        return T.TimestampType()
    if pa.types.is_decimal(t):
        return T.DecimalType(t.precision, t.scale)
    raise UnsupportedTypeError(f"unsupported Arrow type: {t}")


def spark_to_arrow(t: T.DataType) -> pa.DataType:
    """Inverse mapping for casting incoming Arrow data to a table schema."""
    if isinstance(t, T.StringType):
        return pa.string()
    if isinstance(t, T.BooleanType):
        return pa.bool_()
    if isinstance(t, T.IntegerType):
        return pa.int32()
    if isinstance(t, T.LongType):
        return pa.int64()
    if isinstance(t, T.FloatType):
        return pa.float32()
    if isinstance(t, T.DoubleType):
        return pa.float64()
    if isinstance(t, T.BinaryType):
        return pa.binary()
    if isinstance(t, T.DateType):
        return pa.date32()
    if isinstance(t, T.TimestampNTZType):
        return pa.timestamp("us")  # µs precision, reference types.py:52
    if isinstance(t, T.TimestampType):
        return pa.timestamp("us", tz="UTC")
    if isinstance(t, T.DecimalType):
        return pa.decimal128(t.precision, t.scale)
    raise UnsupportedTypeError(f"unsupported Spark type: {t}")


def arrow_schema_to_spark(schema: pa.Schema) -> T.StructType:
    return T.StructType(
        [
            T.StructField(f.name, arrow_to_spark(f.type), True)
            for f in schema
        ]
    )
