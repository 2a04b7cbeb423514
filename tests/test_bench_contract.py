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

import pytest

from iceberg_loader_spark.sources.tables import load_table

pytestmark = pytest.mark.requires_testdata


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


def test_norm_guard_flags_regressions_not_noise():
    """Per-query norm guard (r6 verdict #6) on a stubbed registry: a real
    regression (>2x norm AND >0.75s over it) is flagged; multiplicative
    jitter on a sub-second query is not; unknown keys land in
    new_queries; norms update by elementwise min."""
    sys.path.insert(0, "tools")
    import bench_compare as bc

    norms = {"heavy_op": 4.0, "tiny_op": 0.1, "steady_op": 2.0}
    detail = {
        "queries": {
            "heavy_op": 9.5,   # 2.4x + 5.5s over -> flag
            "tiny_op": 0.35,   # 3.5x but only 0.25s over -> noise, no flag
            "steady_op": 2.3,  # within band
            "brand_new_op": 1.2,  # no norm yet
        },
        "host": {"steal_pct": 0.05},
    }
    report = bc.compare(detail, norms, factor=2.0, abs_floor=0.75)
    assert [r["query"] for r in report["flagged"]] == ["heavy_op"]
    assert report["flagged"][0]["ratio"] == 2.38
    assert report["new_queries"] == ["brand_new_op"]
    assert report["host"]["steal_pct"] == 0.05

    updated = bc.update_norms(detail, norms)
    assert updated["heavy_op"] == 4.0       # min keeps the quiet norm
    assert updated["steady_op"] == 2.0
    assert updated["brand_new_op"] == 1.2   # new key seeds its norm
    faster = bc.update_norms({"queries": {"heavy_op": 3.1}}, updated)
    assert faster["heavy_op"] == 3.1        # quieter run tightens the norm


def test_repo_norms_file_covers_registry():
    """tools/bench_norms.json must track the registry: every norm key is
    a registered query (stale keys would silently never flag)."""
    sys.path.insert(0, "tools")
    import os

    import bench_compare as bc
    from iceberg_loader_spark.operators import all_queries

    norms = json.load(open(bc.NORMS_PATH))
    registered = set(all_queries())
    stale = set(norms) - registered
    assert not stale, f"norm keys not in registry: {sorted(stale)}"
    assert len(norms) >= 250
