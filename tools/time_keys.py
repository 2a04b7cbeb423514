"""Time a subset of registered queries with bench.py's exact in-session
methodology (same session, same warm-up, same inter-query cleanup) —
the instrument for touched-query A/B during an optimization round.

Usage: python tools/time_keys.py <key> [key ...]
Prints one JSON line: {"queries": {key: sec}, "total": sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from iceberg_loader_spark import get_spark  # noqa: E402
from iceberg_loader_spark.operators import all_queries  # noqa: E402


def main() -> None:
    keys = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_keys")
    qs = all_queries()
    bench._warmup(spark, sf_dir)
    import gc

    timings: dict[str, float] = {}
    for name in keys:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        sys.stderr.write(f"[time_keys] {name} {timings[name]}\n")
        bench._clear_session_memos(spark)
        bench._release_all_blocks(spark)
        spark.catalog.clearCache()
        gc.collect()
    print(json.dumps({"queries": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
