"""Runnable-examples smoke: the examples/ scripts (ports of the
reference's examples, /root/reference/examples/) run green end-to-end
against the embedded warehouse — the repo's analogue of the reference's
run_examples_smoke.sh CI step."""

from __future__ import annotations

import importlib.util
import os

import pytest

_EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        f"examples_{name}", os.path.join(_EXAMPLES_DIR, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.usefixtures("spark")
def test_load_with_commits_example(tmp_path):
    mod = _load("load_with_commits")
    result = mod.run_example(str(tmp_path))
    assert result["rows_loaded"] == 2000
    assert result["batches_processed"] == 20


@pytest.mark.usefixtures("spark")
def test_load_upsert_example(tmp_path):
    _load("load_upsert").run_upsert_example(str(tmp_path))


@pytest.mark.usefixtures("spark")
def test_advanced_scenarios_example(tmp_path):
    _load("advanced_scenarios").run_scenarios(str(tmp_path))


@pytest.mark.usefixtures("spark")
def test_load_stream_example(tmp_path):
    result = _load("load_stream").run_stream_load(str(tmp_path), target_mb=2)
    assert result["rows_loaded"] > 0


@pytest.mark.usefixtures("spark")
def test_maintenance_example(tmp_path):
    res = _load("maintenance_example").main(str(tmp_path))
    assert res["expired"]["expired"] > 0
    assert res["converted"]["converted"] == 1
    assert res["merged"]["merged"] >= 1


@pytest.mark.usefixtures("spark")
def test_load_complex_json_example(tmp_path):
    _load("load_complex_json").run_complex_load(str(tmp_path))


@pytest.mark.usefixtures("spark")
def test_load_timestamp_partitioning_example(tmp_path):
    _load("load_timestamp_partitioning").main(str(tmp_path))


@pytest.mark.usefixtures("spark")
def test_load_from_api_example(tmp_path):
    _load("load_from_api").main(str(tmp_path))


@pytest.mark.usefixtures("spark")
def test_compare_complex_json_fail_example(tmp_path):
    _load("compare_complex_json_fail").run_comparison(str(tmp_path))


@pytest.mark.usefixtures("spark")
def test_cdc_and_clustering_example(tmp_path):
    res = _load("cdc_and_clustering").main(str(tmp_path))
    assert res["changes"] == 4


@pytest.mark.usefixtures("spark")
def test_curation_pipeline_example(tmp_path):
    mod = _load("curation_pipeline")
    result = mod.run_example(str(tmp_path))
    funnel = result["funnel"]
    # monotone funnel + the landed train set is a subset of decontam
    # survivors (train bucket < 98 of them)
    assert funnel["1_all"] >= funnel["2_quality"] >= funnel["3_lang"]
    assert funnel["3_lang"] >= funnel["4_exact_dedup"] >= funnel["5_neardup"]
    assert funnel["5_neardup"] >= funnel["6_decontam"]
    assert result["rows_landed"] == funnel["7_train"]
    assert result["tag_version"] >= 2


def test_spark_format_roundtrip_example(tmp_path):
    res = _load("spark_format_roundtrip").main(str(tmp_path))
    assert res["rows"] == 150
    assert res["tagged_rows"] == 100


def test_stream_format_pipeline_example(tmp_path):
    res = _load("stream_format_pipeline").main(str(tmp_path))
    assert res["rows_landed"] == 100


def test_event_analytics_example(tmp_path):
    mod = _load("event_analytics")
    result = mod.run_example(str(tmp_path))
    # one current-state row per distinct user in the log
    assert result["current_state_rows"] > 0
    assert result["latest_dau7"] > 0
    # both touch channels (view, click) earn credit on this corpus
    assert result["channels_credited"] == 2
    assert result["top_paths"] == 3


def test_governance_report_example(tmp_path):
    mod = _load("governance_report")
    result = mod.run_example(str(tmp_path))
    # sketch laws must hold corpus-wide, not just on the audited top-k
    assert result["cm_violations"] == 0
    assert result["hll_violations"] == 0
    assert 0 <= result["exposed_docs"] <= result["total_docs"]
    assert result["report_rows"] > 0
    assert 0 <= result["worst_oov_bps"] <= 10000


def test_train_filter_model_example(tmp_path):
    mod = _load("train_filter_model")
    result = mod.run_example(str(tmp_path))
    # the learning curve must improve train accuracy round over round
    assert result["last_acc_bps"] > result["first_acc_bps"]
    # the shipped model must generalize to the held-out split
    assert result["holdout_acc_bps"] >= 9000
    assert result["n_merges"] == 3
    # BPE must not EXPAND the corpus (<=1 symbol per char by construction)
    assert result["worst_symbols_per_char_bps"] <= 10000
    # curve rows + confusion row + merge rows all landed
    assert result["landed_rows"] == result["rounds"] + 1 + result["n_merges"]


def test_incremental_dedup_and_graph_ann_example(tmp_path):
    mod = _load("incremental_dedup_and_graph_ann")
    result = mod.run_example(str(tmp_path))
    assert result["n_incoming"] > 0
    # suppression is bounded by the pair count and never exceeds incoming
    assert result["n_landed"] <= result["n_incoming"]
    assert result["n_landed"] >= result["n_incoming"] - result["n_neardup_pairs"]
    # 5 queries x top-3 beam results
    assert result["n_beam_hits"] == 15


def test_incremental_mv_refresh_example(tmp_path):
    mod = _load("incremental_mv_refresh")
    result = mod.run_example(str(tmp_path))
    assert result["n_mismatch"] == 0
    assert result["n_mv_keys"] > 0
    assert result["n_delta_keys"] > 0


@pytest.mark.usefixtures("spark")
def test_branch_release_flow_example(tmp_path):
    mod = _load("branch_release_flow")
    res = mod.run_example(str(tmp_path))
    assert res["main_after"] == res["branch_head"]
    assert res["previous_release_rows"] == res["main_before"]
    assert "branch-fork" not in res["history_ops"]  # replay, not fork noise
    assert res["history_ops"].count("append") == 2
    assert "delete" in res["history_ops"]
    assert "release-2" in res["tags"]


def test_hotfix_cherry_pick_example(tmp_path, spark):
    from pyspark.sql import functions as F

    from iceberg_loader_spark.sources.tables import load_table

    mod = _load("hotfix_cherry_pick")
    result = mod.run_example(str(tmp_path))
    docs = load_table(spark, mod.SF_DIR, "documents")
    n_all = docs.count()
    n_zh = docs.filter(F.col("lang") == "zh").count()
    n_src0_nonzh = docs.filter(
        (F.col("source") == "src0") & (F.col("lang") != "zh")
    ).count()
    n_zh_src0 = docs.filter(
        (F.col("source") == "src0") & (F.col("lang") == "zh")
    ).count()
    assert result["released_rows"] == n_all - n_zh
    assert result["after_hotfix"] == n_all - n_zh - n_src0_nonzh
    # cherry-picked zh rows ALL survive, including the src0 ones the
    # hotfix predicate textually matches (newer data sequence)
    assert result["after_cherry_pick"] == result["after_hotfix"] + n_zh
    assert result["zh_src0_survivors"] == n_zh_src0 > 0
    assert result["second_client_rows"] == result["after_cherry_pick"]
    assert result["versions"] == 4
