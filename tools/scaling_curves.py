"""Empirical scaling curves for the heavy bench families (r6 verdict #3).

The O(n) claims behind each heavy operator are plan-audited (pinned
fingerprints, no-cross-product asserts) but were never MEASURED across
scale.  This tool runs the top-N bench queries (by their BENCH_DETAIL
wall seconds) at sf0.01 and sf0.1 — 10x the rows — inside one warmed
session per scale factor with the exact bench.py inter-query hygiene,
and reports the time ratio.  A linear operator should come in well
UNDER 10x (fixed per-query engine cost amortizes); the flag threshold
is 12x, past which a mechanism note or a fix is owed in BASELINE.md.

Session cost per query is NOT subtracted: the ratio is conservative
(fixed cost inflates the sf0.01 denominator's share, deflating the
ratio) only if you subtract it — reporting raw ratios keeps the number
honest and reproducible.

Usage:
    python tools/scaling_curves.py [--top N] [--keys k1,k2,...]
                                   [--repeat R] [--json out.json]
                                   [--sf-small DIR] [--sf-big DIR]

Round 9: --sf-small/--sf-big override the measured decade — pair them
with tools/gen_scale_decade.py's synthetic sf1 to measure sf0.1 -> sf1
(the second decade, where fixed cost no longer shelters a superlinear
operator).

Output: a markdown table on stdout (paste target: BASELINE.md scaling
block) + optional JSON sidecar.  --repeat R (default 1) takes the MIN
of R runs per (query, sf) — min is the right statistic under host
steal, same reasoning as tools/bench_compare.py norms.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
sys.path.insert(0, REPO)

from iceberg_loader_spark import get_spark
from iceberg_loader_spark.operators import all_queries

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"
FLAG_RATIO = 12.0


def _cleanup(spark) -> None:
    """bench.py's inter-query hygiene: clear shared-fragment memos and
    deterministically unpersist every pinned block."""
    memo = getattr(spark, "_ils_fragment_memo", None)
    if memo:
        memo.clear()
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for k in list(jmap.keys()):
            jmap[k].unpersist(False)
    except Exception:  # pragma: no cover - py4j surface drift
        pass
    spark.catalog.clearCache()
    gc.collect()


def _clear_artifacts() -> None:
    """Drop the persisted shared-fragment artifact cache so the NEXT
    consumer query pays the full build — used by --fresh-artifacts to
    measure build-path scaling instead of steady-state scan scaling."""
    from iceberg_loader_spark.operators import dedup

    dedup._ARTIFACT_ROOTS.clear()


def _time_at(spark, keys, sf_dir, repeat, fresh_artifacts=False):
    qs = all_queries()
    out = {}
    # warm-up mirrors bench.py: real parquet path + Arrow worker fork
    spark.range(1).count()
    from iceberg_loader_spark.sources.tables import load_table

    load_table(spark, sf_dir, "region").count()
    spark.range(4).mapInPandas(lambda it: it, schema="id long").count()
    load_table(spark, sf_dir, "documents").selectExpr(
        "sum(octet_length(text)) AS s"
    ).collect()
    for key in keys:
        best = None
        for _ in range(repeat):
            if fresh_artifacts:
                _clear_artifacts()
            t0 = time.perf_counter()
            qs[key](spark, sf_dir).count()
            sec = time.perf_counter() - t0
            best = sec if best is None else min(best, sec)
            _cleanup(spark)
        out[key] = round(best, 3)
    return out


def main() -> int:
    argv = sys.argv[1:]
    top_n = int(argv[argv.index("--top") + 1]) if "--top" in argv else 10
    repeat = int(argv[argv.index("--repeat") + 1]) if "--repeat" in argv else 1
    if "--keys" in argv:
        keys = argv[argv.index("--keys") + 1].split(",")
    else:
        detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
        ranked = sorted(
            detail["queries"].items(), key=lambda kv: kv[1], reverse=True
        )
        keys = [k for k, _ in ranked[:top_n]]

    fresh = "--fresh-artifacts" in argv
    sf_small = (
        argv[argv.index("--sf-small") + 1] if "--sf-small" in argv else SF_SMALL
    )
    sf_big = (
        argv[argv.index("--sf-big") + 1] if "--sf-big" in argv else SF_BIG
    )
    lbl_s = os.path.basename(sf_small.rstrip("/"))
    lbl_b = os.path.basename(sf_big.rstrip("/"))
    spark = get_spark("scaling_curves")
    small = _time_at(spark, keys, sf_small, repeat, fresh_artifacts=fresh)
    big = _time_at(spark, keys, sf_big, repeat, fresh_artifacts=fresh)

    rows = []
    for k in keys:
        s, b = small[k], big[k]
        ratio = round(b / s, 2) if s > 0 else float("inf")
        rows.append((k, s, b, ratio))
    rows.sort(key=lambda r: r[3], reverse=True)

    print(f"| query | {lbl_s} s | {lbl_b} s | ratio (10x data) | verdict |")
    print("|---|---|---|---|---|")
    for k, s, b, ratio in rows:
        verdict = "**FLAG >12x**" if ratio > FLAG_RATIO else "linear-or-better"
        print(f"| {k} | {s} | {b} | {ratio}x | {verdict} |")

    if "--json" in argv:
        out_path = argv[argv.index("--json") + 1]
        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_small": sf_small,
                    "sf_big": sf_big,
                    "repeat": repeat,
                    "rows": [
                        {"query": k, "sf001": s, "sf01": b, "ratio": r}
                        for k, s, b, r in rows
                    ],
                },
                f,
                indent=1,
            )
        print(f"\njson -> {out_path}", file=sys.stderr)
    flagged = [k for k, _, _, r in rows if r > FLAG_RATIO]
    if flagged:
        print(
            f"\nFLAGGED (> {FLAG_RATIO}x on 10x data — owe a mechanism note "
            f"or a fix): {', '.join(flagged)}",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
