"""Multi-process executor smoke: the top-N bench queries plus the
sparkberg DataSource read/write/stream paths under ``local-cluster``
(VERDICT r7 #4).

``local[k]`` runs one JVM and one Python worker pool, so closure and
broadcast serialization, executor-side Python worker spawn, and
socket-shuffle never happen — the one class of 100×-readiness bug the
regular suite cannot surface. ``local-cluster[2,4,2048]`` launches two
REAL executor processes (4 cores / 2 GiB each): every task closure and
broadcast crosses a process boundary, Arrow/pandas workers fork on the
executors, and shuffles move over local sockets.

Usage::

    python tools/local_cluster_smoke.py [--top N] [--sf DIR] [--record]

``--top N``  run the N slowest queries from BENCH_DETAIL.json (default 20)
``--record`` rewrite the generated block in BASELINE.md with the results

Prints one summary JSON line last; exit code 1 if anything failed.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# always exercised regardless of --top selection: the streaming engine
# paths (exactly-once sink, streaming index maintenance, streaming
# funnel) and the DataSource suite below are the serialization-heaviest
ALWAYS = [
    "lifecycle_stream_sink_counts",
    "stream_incremental_minhash_candidates",
    "stream_curation_funnel_counts",
    "stream_ooo_curation_funnel_counts",
    "lifecycle_eq_delete_convert_counts",
    "embedding_lsh_planes_tradeoff",
    "embedding_lsh_ortables_tradeoff",
]


def _top_keys(n: int) -> list[str]:
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
        detail = json.load(f)
    ranked = sorted(
        detail["queries"].items(), key=lambda kv: kv[1], reverse=True
    )
    keys = [k for k, _ in ranked[:n]]
    for k in ALWAYS:
        if k not in keys:
            keys.append(k)
    return keys


def _datasource_smoke(spark, tmp_root: str) -> None:
    """sparkberg DSv2 batch write → batch read → streaming read/write:
    each plan ships the Python DataSource class to executor processes."""
    from pyspark.sql import functions as F

    from iceberg_loader_spark.sources.spark_datasource import (
        register as register_ds,
    )

    register_ds(spark)
    root = os.path.join(tmp_root, "ds_tbl")
    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    df.write.format("sparkberg").mode("append").save(root)
    back = spark.read.format("sparkberg").load(root)
    assert back.count() == 200, "DSv2 batch read lost rows"
    assert back.agg(F.sum("v")).collect()[0][0] == sum(i % 7 for i in range(200))

    # streaming write (exactly-once sink path) from a rate-limited file
    # stream into a second table, then read it back
    src = os.path.join(tmp_root, "ds_src")
    df.repartition(2).write.mode("overwrite").parquet(src)
    dst = os.path.join(tmp_root, "ds_stream_tbl")
    q = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.format("sparkberg")
        .option("path", dst)
        .option("checkpointLocation", os.path.join(tmp_root, "ds_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.format("sparkberg").load(dst).count() == 200, (
        "DSv2 streaming write lost rows"
    )


def run(top_n: int, sf_dir: str) -> dict:
    import tempfile

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .appName("local_cluster_smoke")
        .config("spark.executor.memory", "2g")
        .config("spark.sql.shuffle.partitions", "16")
        # executor-side Python workers are SEPARATE processes that do NOT
        # inherit the driver's sys.path: without this every pandas UDF /
        # mapInPandas / DataSource closure dies with ModuleNotFoundError
        # (found by this very smoke). Production analog: pip-install the
        # package on the cluster or ship it via --py-files.
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .getOrCreate()
    )
    qs = entrymod.queries()
    keys = _top_keys(top_n)
    results: dict[str, dict] = {}
    ok = True
    for k in keys:
        t0 = time.perf_counter()
        try:
            n = qs[k](spark, sf_dir).count()
            results[k] = {
                "rows": n,
                "sec": round(time.perf_counter() - t0, 2),
                "ok": True,
            }
            print(f"  ok {k}: rows={n} [{results[k]['sec']}s]", flush=True)
        except Exception as e:  # noqa: BLE001 — smoke reports, never hides
            ok = False
            results[k] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            print(f"  FAIL {k}: {results[k]['error'][:300]}", flush=True)
    t0 = time.perf_counter()
    try:
        _datasource_smoke(spark, tempfile.mkdtemp(prefix="ils_lc_ds_"))
        results["datasource_batch_and_stream"] = {
            "rows": 400,
            "sec": round(time.perf_counter() - t0, 2),
            "ok": True,
        }
        print("  ok datasource_batch_and_stream", flush=True)
    except Exception as e:  # noqa: BLE001
        ok = False
        results["datasource_batch_and_stream"] = {
            "ok": False,
            "error": f"{type(e).__name__}: {e}",
        }
        print(f"  FAIL datasource: {e}", flush=True)
    spark.stop()
    return {"ok": ok, "results": results}


def record(summary: dict) -> None:
    """Rewrite the generated local-cluster block in BASELINE.md."""
    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as f:
        text = f.read()
    res = summary["results"]
    n_ok = sum(1 for v in res.values() if v.get("ok"))
    lines = [
        "<!-- local-cluster:begin (generated by tools/local_cluster_smoke.py) -->",
        "## local-cluster executor smoke (round 8+)",
        "",
        f"`local-cluster[2,4,2048]` (two real executor processes, socket",
        f"shuffle, executor-side Python workers): **{n_ok}/{len(res)} green**.",
        "Queries are the slowest from the last recorded bench plus the",
        "streaming trio and the sparkberg DataSource batch+stream paths.",
        "",
        "| query | rows | sec |",
        "|---|---|---|",
    ]
    for k, v in sorted(res.items(), key=lambda kv: -(kv[1].get("sec", 0))):
        if v.get("ok"):
            lines.append(f"| {k} | {v['rows']} | {v['sec']} |")
        else:
            lines.append(f"| {k} | FAIL | {v.get('error', '')[:120]} |")
    lines += ["<!-- local-cluster:end -->", ""]
    block = "\n".join(lines)
    if "<!-- local-cluster:begin" in text:
        text = re.sub(
            r"<!-- local-cluster:begin.*?<!-- local-cluster:end -->\n",
            block,
            text,
            flags=re.S,
        )
    else:
        text = text.rstrip() + "\n\n" + block
    with open(path, "w") as f:
        f.write(text)
    print(f"recorded {n_ok}/{len(res)} to BASELINE.md")


def main() -> None:
    top_n = 20
    if "--top" in sys.argv:
        top_n = int(sys.argv[sys.argv.index("--top") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    summary = run(top_n, sf_dir)
    if "--record" in sys.argv:
        record(summary)
    print(
        json.dumps(
            {
                "metric": "local_cluster_smoke",
                "ok": summary["ok"],
                "n": len(summary["results"]),
                "n_ok": sum(
                    1 for v in summary["results"].values() if v.get("ok")
                ),
            }
        )
    )
    sys.exit(0 if summary["ok"] else 1)


if __name__ == "__main__":
    main()
