"""Partition transform parser parity (reference tests/test_partitioning.py)."""

import pytest
from pyspark.sql import types as T

from iceberg_loader_spark.tables.partitioning import (
    PartitionError,
    parse_partition_transform,
    validate_spec,
)


@pytest.mark.parametrize(
    "expr,transform,source,param,name",
    [
        ("category", "identity", "category", None, "category"),
        ("year(ts)", "year", "ts", None, "ts_year"),
        ("month(ts)", "month", "ts", None, "ts_month"),
        ("day(ts)", "day", "ts", None, "ts_day"),
        ("hour(ts)", "hour", "ts", None, "ts_hour"),
        ("bucket(16, id)", "bucket", "id", 16, "id_bucket_16"),
        ("truncate(4, name)", "truncate", "name", 4, "name_trunc_4"),
        ("void(col)", "void", "col", None, "col_void"),
    ],
)
def test_parse_all_transforms(expr, transform, source, param, name):
    pf = parse_partition_transform(expr)
    assert pf.transform == transform
    assert pf.source == source
    assert pf.param == param
    assert pf.name == name


@pytest.mark.parametrize(
    "expr",
    ["", "day()", "bucket(id)", "bucket(x, id)", "bucket(0, id)", "nope(ts)", "1col"],
)
def test_parse_failures(expr):
    with pytest.raises(PartitionError):
        parse_partition_transform(expr)


def _schema():
    return T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("name", T.StringType()),
        ]
    )


def test_time_transform_requires_temporal():
    with pytest.raises(PartitionError):
        validate_spec([parse_partition_transform("day(id)")], _schema())
    # string is allowed (promotion path), timestamp is allowed
    validate_spec([parse_partition_transform("day(name)")], _schema())
    validate_spec([parse_partition_transform("day(ts)")], _schema())


def test_identity_on_timestamp_warns():
    warnings = validate_spec([parse_partition_transform("ts")], _schema())
    assert len(warnings) == 1


def test_unknown_source_column_rejected():
    with pytest.raises(PartitionError):
        validate_spec([parse_partition_transform("day(zzz)")], _schema())
