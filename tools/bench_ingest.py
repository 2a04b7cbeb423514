"""Ingestion baseline (BASELINE.md §"Baseline to be measured").

Measures the Part A write path at a given scale factor against a local
warehouse: plain append, partitioned append, upsert (MERGE), idempotent
replace-by-filter, snapshot expiry after many appends, and compaction.
Prints one JSON line; numbers are recorded in BASELINE.md.

Usage: python tools/bench_ingest.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_loader_spark import get_spark
from iceberg_loader_spark.config import LoaderConfig
from iceberg_loader_spark.loader import SparkLoader
from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables.maintenance import (
    expire_snapshots,
    rewrite_data_files,
)


def measure(spark, sf_dir: str) -> dict:
    """One full write-path measurement pass at ``sf_dir``; returns the
    per-operation seconds/MBps dict (the body behind both the single-
    point JSON line and the --scaling table)."""
    lineitem = pq.read_table(f"{sf_dir}/lineitem.parquet")
    orders = pq.read_table(f"{sf_dir}/orders.parquet")
    mb = lineitem.nbytes / 1e6

    out: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        wh = Warehouse(os.path.join(tmp, "warehouse"))
        loader = SparkLoader(spark, wh)

        # 1. plain append (lineitem, unpartitioned)
        t0 = time.perf_counter()
        loader.load_data(lineitem, "db.lineitem", LoaderConfig(commit_interval=100))
        out["append_lineitem_s"] = round(time.perf_counter() - t0, 3)
        out["append_lineitem_mb_s"] = round(mb / out["append_lineitem_s"], 1)

        # 2. partitioned append: day(l_shipdate)
        t0 = time.perf_counter()
        loader.load_data(
            lineitem,
            "db.lineitem_part",
            LoaderConfig(partition_by="day(l_shipdate)", commit_interval=100),
        )
        out["append_partitioned_s"] = round(time.perf_counter() - t0, 3)

        # 3. upsert 10% of orders by o_orderkey (half changed, half new keys)
        loader.load_data(orders, "db.orders", LoaderConfig(commit_interval=100))
        n = orders.num_rows
        upd = orders.slice(0, n // 10)
        t0 = time.perf_counter()
        loader.load_data(
            upd, "db.orders", LoaderConfig(join_cols=("o_orderkey",))
        )
        out["upsert_10pct_orders_s"] = round(time.perf_counter() - t0, 3)

        # 3b. the same 10% upsert in the write-optimized MoR posture
        # (r9 verdict #5): commit cost is O(source) — new data files plus
        # ONE equality-delete file on the join key, nothing read or
        # rewritten — vs CoW's O(matched files) rewrite above. The scan
        # row records what the deferred merge costs readers until
        # compaction materializes it.
        loader.load_data(orders, "db.orders_mor", LoaderConfig(commit_interval=100))
        t0 = time.perf_counter()
        loader.load_data(
            upd,
            "db.orders_mor",
            LoaderConfig(join_cols=("o_orderkey",), row_level_mode="mor"),
        )
        out["upsert_mor_10pct_orders_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        wh.load_table("db.orders_mor").scan(spark).count()
        out["scan_after_mor_merge_s"] = round(time.perf_counter() - t0, 3)

        # 4. idempotent replace of one ship-day
        t0 = time.perf_counter()
        loader.load_data(
            lineitem.slice(0, 1000),
            "db.lineitem",
            LoaderConfig(replace_filter="l_linenumber == 1"),
        )
        out["replace_filter_s"] = round(time.perf_counter() - t0, 3)

        # 5. 20 small appends then expire to last 5 snapshots
        small = orders.slice(0, 500)
        for _ in range(20):
            loader.load_data(small, "db.churn")
        t = wh.load_table("db.churn")
        t0 = time.perf_counter()
        expire_snapshots(t, keep_last=5)
        out["expire_snapshots_s"] = round(time.perf_counter() - t0, 3)

        # 6. compaction of the churned table
        t0 = time.perf_counter()
        rewrite_data_files(t, spark)
        out["rewrite_data_files_s"] = round(time.perf_counter() - t0, 3)

        out["lineitem_rows"] = lineitem.num_rows
        out["lineitem_mb"] = round(mb, 1)
        out["append_partitioned_mb_s"] = round(
            mb / out["append_partitioned_s"], 1
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


_SCALING_OPS = [
    # key, label, mechanism note shown when the 10x-data ratio is checked
    ("append_lineitem_s", "append (unpartitioned)", "O(rows) write"),
    ("append_partitioned_s", "append day(l_shipdate)", "O(rows) write + partition clustering shuffle"),
    ("upsert_10pct_orders_s", "MERGE upsert 10% of orders", "O(table) rewrite of matched files at this table size"),
    ("upsert_mor_10pct_orders_s", "MERGE upsert 10% (MoR)", "O(source): new files + one equality-delete, nothing rewritten"),
    ("scan_after_mor_merge_s", "scan after MoR MERGE", "read-side anti-join vs the key file until compaction"),
    ("replace_filter_s", "idempotent replace-by-filter", "metadata candidate split + O(matching files) rewrite"),
    ("expire_snapshots_s", "expire 20->5 snapshots", "O(manifests), data untouched"),
    ("rewrite_data_files_s", "compaction (churned table)", "O(live rows) rewrite"),
]


def scaling(sf_small: str, sf_big: str, record: bool) -> None:
    """Run the write path at two scale factors and emit the ratio table
    (VERDICT r7 #8) — the ingest-side twin of tools/scaling_curves.py.
    Flags nothing silently: every op row carries its measured ratio and
    the expected mechanism; a ratio far above the data ratio (10x here)
    means a superlinear write path and should be investigated, not
    re-normed."""
    spark = get_spark("bench-ingest")
    spark.range(1).count()
    small = measure(spark, sf_small)
    big = measure(spark, sf_big)
    rows = []
    for key, label, mech in _SCALING_OPS:
        a, b = small.get(key), big.get(key)
        ratio = round(b / a, 2) if a and b else None
        rows.append((label, a, b, ratio, mech))
    print(json.dumps({
        "metric": "ingest_scaling",
        "sf_small": sf_small,
        "sf_big": sf_big,
        "rows": [
            {"op": r[0], "small_s": r[1], "big_s": r[2], "ratio": r[3]}
            for r in rows
        ],
        "mb_small": small["lineitem_mb"],
        "mb_big": big["lineitem_mb"],
        "append_mb_s_small": small["append_lineitem_mb_s"],
        "append_mb_s_big": big["append_lineitem_mb_s"],
    }))
    if record:
        import re

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(repo, "BASELINE.md")
        with open(path) as f:
            text = f.read()
        lines = [
            "<!-- ingest-scaling:begin (generated by tools/bench_ingest.py --scaling) -->",
            "## Ingest-path scaling (round 8+)",
            "",
            f"Write path measured at {sf_small} ({small['lineitem_mb']} MB"
            f" lineitem) vs {sf_big} ({big['lineitem_mb']} MB): throughput "
            f"{small['append_lineitem_mb_s']} -> "
            f"{big['append_lineitem_mb_s']} MB/s unpartitioned, "
            f"{small['append_partitioned_mb_s']} -> "
            f"{big['append_partitioned_mb_s']} MB/s partitioned. Small-SF "
            "rows are dominated by fixed per-commit cost (job launch + "
            "manifest IO), so ratios well BELOW the 10x data ratio are the "
            "expected signature of a flat-overhead, O(rows) write path; a "
            "ratio far ABOVE 10x would flag a superlinear mechanism. The "
            "partitioned append is the extreme case: day(l_shipdate) "
            "yields ~2,450 partitions at BOTH scale factors, so sf0.01 "
            "pays ~2,450 file creations for 4.7 MB of data — per-file "
            "fixed cost, amortized 10x better at sf0.1 and entirely at "
            "production file sizes. CoW-vs-MoR MERGE crossover: the MoR "
            f"row ({big['upsert_mor_10pct_orders_s']} s at sf0.1 vs "
            f"{big['upsert_10pct_orders_s']} s CoW) commits O(source) "
            "(new files + one equality-delete on the key, nothing "
            "rewritten) while CoW pays O(matched files) — a gap that "
            "widens with table size; the scan row is what readers pay "
            "until convert_equality_deletes/compaction materializes the "
            "merge.",
            "",
            "| op | sf0.01 s | sf0.1 s | ratio (10x data) | mechanism |",
            "|---|---|---|---|---|",
        ]
        for label, a, b, ratio, mech in rows:
            lines.append(f"| {label} | {a} | {b} | {ratio} | {mech} |")
        lines += ["<!-- ingest-scaling:end -->", ""]
        block = "\n".join(lines)
        if "<!-- ingest-scaling:begin" in text:
            text = re.sub(
                r"<!-- ingest-scaling:begin.*?<!-- ingest-scaling:end -->\n",
                block,
                text,
                flags=re.S,
            )
        else:
            text = text.rstrip() + "\n\n" + block
        with open(path, "w") as f:
            f.write(text)
        print(f"recorded ingest-scaling block ({len(rows)} ops) to BASELINE.md")


def main() -> None:
    if "--scaling" in sys.argv:
        scaling(
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
            record="--record" in sys.argv,
        )
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-ingest")
    spark.range(1).count()  # JVM warm-up
    out = measure(spark, sf_dir)
    print(json.dumps({"metric": "ingest_bench", "sf_dir": sf_dir, **out}))


if __name__ == "__main__":
    main()
