"""Local mimic of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and
cell values exactly (columns sorted by name, rows sorted by all columns).

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from iceberg_loader_spark import get_spark  # noqa: E402
from iceberg_loader_spark.sources.tables import TABLE_NAMES  # noqa: E402


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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"  ~ {name}: no oracle (rows-only) rows={len(sdf)} [{time.time()-t0:.1f}s]")
                continue
            odf = con.sql(oracles[name]).df()
            a, b = canon(sdf), canon(odf)
            if list(a.columns) != list(b.columns):
                raise AssertionError(f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}")
            if len(a) != len(b):
                raise AssertionError(f"row counts differ: spark={len(a)} oracle={len(b)}")
            pd.testing.assert_frame_equal(a, b, check_exact=True, check_dtype=False)
            n_pass += 1
            print(f"  ✓ {name}: rows={len(a)} [{time.time()-t0:.1f}s]")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"  ✗ {name}: {type(e).__name__}: {e}")
            if "--trace" in sys.argv:
                traceback.print_exc()
    print(f"\n{n_pass} passed, {n_fail} failed (sf_dir={sf_dir})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
