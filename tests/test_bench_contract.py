"""The driver's bench contract: bench.py must print ONE parseable JSON
object as the LAST stdout line (the driver captures only a short output
tail) with the agreed keys, and write the full per-query map to the
sidecar file — pinned here against a tiny stubbed registry so the test
costs seconds, not a full bench run.
"""

from __future__ import annotations

import io
import json
import sys

from iceberg_loader_spark.sources.tables import load_table


def test_bench_prints_one_json_line_and_sidecar(spark, tmp_path, monkeypatch):
    import bench

    def tiny_queries():
        return {
            "probe_region": lambda s, d: load_table(s, d, "region"),
            "probe_nation": lambda s, d: load_table(s, d, "nation"),
        }

    monkeypatch.setattr(bench, "all_queries", tiny_queries)
    monkeypatch.setattr(bench, "get_spark", lambda name: spark)
    monkeypatch.setattr(
        bench, "DETAIL_PATH", str(tmp_path / "BENCH_DETAIL.json")
    )
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    bench.main()
    sys.stdout = sys.__stdout__

    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    summary = json.loads(lines[-1])  # LAST line is the contract
    assert summary["metric"] == "total_query_wall_seconds"
    assert summary["unit"] == "sec"
    assert summary["n_queries"] == 2
    assert summary["sf"] == 0.001
    assert summary["value"] >= 0

    detail = json.loads((tmp_path / "BENCH_DETAIL.json").read_text())
    assert set(detail["queries"]) == {"probe_region", "probe_nation"}
    assert abs(sum(detail["queries"].values()) - detail["value"]) < 0.01
