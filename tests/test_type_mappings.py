"""Type registry parity (reference tests/test_type_mappings.py)."""

import pyarrow as pa
import pytest
from pyspark.sql import types as T

from iceberg_loader_spark.types import (
    UnsupportedTypeError,
    arrow_to_spark,
    register_custom_mapping,
    spark_to_arrow,
)


@pytest.mark.parametrize(
    "arrow,spark",
    [
        (pa.string(), T.StringType()),
        (pa.int8(), T.IntegerType()),
        (pa.int16(), T.IntegerType()),
        (pa.int32(), T.IntegerType()),
        (pa.uint16(), T.IntegerType()),
        (pa.int64(), T.LongType()),
        (pa.uint32(), T.LongType()),
        (pa.float32(), T.FloatType()),
        (pa.float64(), T.DoubleType()),
        (pa.bool_(), T.BooleanType()),
        (pa.binary(), T.BinaryType()),
        (pa.date32(), T.DateType()),
        (pa.timestamp("s"), T.TimestampNTZType()),
        (pa.timestamp("ns"), T.TimestampNTZType()),
        (pa.timestamp("us", tz="UTC"), T.TimestampType()),
        (pa.decimal128(10, 2), T.DecimalType(10, 2)),
        (pa.null(), T.StringType()),
    ],
)
def test_arrow_to_spark(arrow, spark):
    assert arrow_to_spark(arrow) == spark


def test_uint64_maps_to_decimal_20_0():
    assert arrow_to_spark(pa.uint64()) == T.DecimalType(20, 0)


def test_unsupported_type_raises():
    with pytest.raises(UnsupportedTypeError):
        arrow_to_spark(pa.duration("s"))
    with pytest.raises(UnsupportedTypeError):
        arrow_to_spark(pa.list_(pa.int32()))


def test_custom_mapping_hook():
    register_custom_mapping(pa.duration("s"), T.LongType())
    try:
        assert arrow_to_spark(pa.duration("s")) == T.LongType()
    finally:
        from iceberg_loader_spark import types as m

        m._CUSTOM.clear()


def test_roundtrip_spark_to_arrow():
    assert spark_to_arrow(T.TimestampNTZType()) == pa.timestamp("us")
    assert spark_to_arrow(T.TimestampType()) == pa.timestamp("us", tz="UTC")
    assert spark_to_arrow(T.DecimalType(20, 0)) == pa.decimal128(20, 0)
