"""t2-style oracle tests: every declared query hash-matches DuckDB at
sf0.001 (the full sf0.01 sweep runs via tools/verify_local.py)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from iceberg_loader_spark.sources.tables import TABLE_NAMES
from tests.conftest import SF_SMOKE

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("int64")
        else:
            out[c] = s.astype("string")
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_query_has_oracle():
    missing = [k for k in QUERIES if k not in ORACLES]
    assert missing == [], f"queries without oracle: {missing}"


def test_approx_distinct_users_error_bound(spark):
    """The self-verifying bound verdict must hold (it is also what the
    oracle hash checks — this pins the failure locally with a clearer
    message)."""
    rows = QUERIES["approx_distinct_users"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.hll_within_5pct, f"{r.event_type}: HLL outside 5% bound"


def test_approx_percentile_error_bound(spark):
    rows = QUERIES["approx_percentile_value"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.sketch_within_5pct, f"{r.event_type}: sketch outside 5% bound"


# Queries allowed to return 0 rows at the sf0.001 smoke scale ONLY (they
# are non-empty at sf0.01, where tools/verify_local.py enforces the same
# guard with an empty allowlist). A 0-row pass anywhere else is vacuous:
# both engines agreeing on nothing proves nothing (round-4 verdict).
EMPTY_OK_AT_SMOKE: set[str] = set()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_match(spark, duck, name):
    sdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    if name not in ORACLES:
        pytest.skip("rows-only query")
    odf = duck.sql(ORACLES[name]).df()
    a, b = canon(sdf), canon(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"rows: spark={len(a)} oracle={len(b)}"
    pd.testing.assert_frame_equal(a, b, check_exact=True, check_dtype=False)
    if name not in EMPTY_OK_AT_SMOKE:
        assert len(a) > 0, "vacuous pass: 0 rows from both engines"


def test_minhash_oracle_match_under_persist_materialize(spark, duck):
    """The cluster-scale persist materialize mode produces identical
    results to the default localCheckpoint mode (flag-switched seam,
    operators/dedup.py set_materialize_mode)."""
    from iceberg_loader_spark.operators import dedup

    dedup.set_materialize_mode("persist")
    try:
        sdf = QUERIES["minhash_lsh_candidates"](spark, SF_SMOKE).toPandas()
    finally:
        dedup.set_materialize_mode("local_checkpoint")
        # the persist-mode frames live in the session CacheManager, and
        # Catalyst substitutes cached subtrees into every LATER plan of
        # the same fragments — leaking them changes other tests'
        # fingerprints (measured: dedup_cluster_assign's explain gained
        # 2-3x operators from InMemoryRelation-inlined cached plans)
        spark.catalog.clearCache()
    odf = duck.sql(ORACLES["minhash_lsh_candidates"]).df()
    a, b = canon(sdf), canon(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_exact=True, check_dtype=False)


def test_registry_order_is_stable():
    """The registry order is pinned (operators/__init__.py): external
    verification samples it per round, so a silent reorder would reset the
    cross-round coverage union. The first entries must stay the round-3
    dedup-family prefix; relational/TPC-H entries close the registry."""
    keys = list(QUERIES)
    assert keys[0] == "exact_dedup_documents"
    assert keys.index("minhash_lsh_candidates") < keys.index(
        "q1_pricing_summary"
    )
    assert len(keys) == len(set(keys))
