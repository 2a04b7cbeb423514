"""Declarative data-quality checks: one-pass row rules, uniqueness,
foreign keys — report shape and violation counting."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from iceberg_loader_spark.quality import Check
from tests.conftest import SF_SMOKE


def test_all_green_on_clean_lineitem(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    report = (
        Check()
        .not_null("l_orderkey", "l_partkey")
        .in_range("l_quantity", 1, 50)
        .non_negative("l_extendedprice", "l_discount")
        .accepted_values("l_returnflag", ["A", "N", "R"])
        .foreign_key("l_orderkey", orders, "o_orderkey")
        .run(li)
    )
    # the synthetic lineitem has no (orderkey, linenumber) PK, so the
    # uniqueness rule is exercised on orders' real PK instead
    report = report.unionByName(
        Check().unique("o_orderkey").run(orders)
    )
    rep = report.collect()
    assert len(rep) == 8  # 2 not_null + 1 range + 2 non_neg + 1 accepted + 1 fk + 1 unique
    assert all(r["passed"] for r in rep)
    assert all(r["n_violations"] == 0 for r in rep)


def test_violations_counted_exactly(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 5),
            (2, None, -3),
            (2, "zz", 200),
            (None, "a", 7),
        ],
        "id long, code string, qty long",
    )
    dim = spark.createDataFrame([("a",), ("b",)], "code string")
    report = (
        Check()
        .not_null("id")
        .not_null("code")
        .in_range("qty", 0, 100)
        .non_negative("qty")
        .accepted_values("code", ["a", "b"])
        .matches("code", "^[a-m]+$")
        .unique("id")
        .foreign_key("code", dim, "code")
        .run(df)
    )
    got = {
        (r["constraint"], r["column"]): r["n_violations"]
        for r in report.collect()
    }
    assert got[("not_null", "id")] == 1
    assert got[("not_null", "code")] == 1
    # qty=-3 (below), qty=200 (above) -> 2 range violations
    assert got[("in_range", "qty")] == 2
    assert got[("non_negative", "qty")] == 1
    # NULL code + 'zz' both violate accepted_values
    assert got[("accepted_values", "code")] == 2
    assert got[("matches", "code")] == 2  # NULL + 'zz'
    assert got[("unique", "id")] == 1  # one duplicated key group (id=2)
    assert got[("foreign_key(code)", "code")] == 1  # 'zz' orphan


def test_satisfies_custom_predicate(spark):
    df = spark.createDataFrame([(1, 2), (5, 3)], "a long, b long")
    report = Check().satisfies("a_lt_b", F.col("a") < F.col("b")).run(df)
    r = report.collect()[0]
    assert r["constraint"] == "satisfies"
    assert r["column"] == "a_lt_b"
    assert r["n_violations"] == 1 and not r["passed"]


def test_unique_requires_columns():
    with pytest.raises(ValueError):
        Check().unique()
