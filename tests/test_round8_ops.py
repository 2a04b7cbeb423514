"""Round-8 operator invariants: the streaming curation funnel's
exactly-once / ordered-ingestion / retroactive-decontamination
contracts, and the winnowing window-tradeoff monotonicity."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

QUERIES = entrymod.queries()


# ---- streaming curation funnel -------------------------------------------


def test_stream_funnel_matches_incremental(spark):
    """Batch-invariance under the ordered-ingestion precondition: the
    3-micro-batch streamed funnel must produce EXACTLY the one-shot
    incremental funnel's per-stage counts (whose oracle it shares)."""
    streamed = {
        (r.stage, r.n_docs)
        for r in QUERIES["stream_curation_funnel_counts"](
            spark, SF_SMOKE
        ).collect()
    }
    oneshot = {
        (r.stage, r.n_docs)
        for r in QUERIES["incremental_curation_funnel_counts"](
            spark, SF_SMOKE
        ).collect()
    }
    assert streamed == oneshot
    assert dict(streamed)["1_incoming"] >= 1, "vacuous: empty incoming half"


def _funnel_fixture(spark, tmp_path, tag):
    from pyspark.sql import functions as F

    from iceberg_loader_spark.operators.dedup import (
        CurationStreamFunnel,
        _doc_bucket_col,
        _grams5_frame,
        _simhash_df,
    )
    from iceberg_loader_spark.sources.tables import load_table
    from iceberg_loader_spark.tables import Warehouse

    docs = load_table(spark, SF_SMOKE, "documents")
    marked = docs.withColumn("bucket", _doc_bucket_col())
    hist = marked.filter(F.col("bucket") < 50).drop("bucket")
    inc = marked.filter(F.col("bucket") >= 50).drop("bucket")
    wh = Warehouse(str(tmp_path / f"wh_{tag}"))
    f = CurationStreamFunnel(spark, wh)
    f.seed(
        hist.select(F.md5("text").alias("h")).distinct(),
        _simhash_df(hist).select("simhash").distinct(),
        _grams5_frame(hist.filter(F.col("doc_id") % 10 == 0))
        .select("g")
        .distinct(),
    )
    mid = inc.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    b0 = inc.filter(F.col("doc_id") <= mid)
    b1 = inc.filter(F.col("doc_id") > mid)
    return f, wh, b0, b1


def _state(spark, wh):
    surv = {
        (r.doc_id, r.bucket)
        for r in wh.load_table("db.cf_surv").scan(spark).collect()
    }
    versions = {
        name: wh.load_table(f"db.{name}").meta.current_version()
        for name in ("cf_surv", "cf_fp", "cf_sh", "cf_ev", "cf_sg")
    }
    return surv, versions


def test_stream_funnel_replay_is_idempotent(spark, tmp_path):
    """Replaying a fully committed micro-batch (foreachBatch's
    at-least-once contract) must change NOTHING: every per-table marker
    skips, no new commits land, and the retro delete is a no-op."""
    f, wh, b0, b1 = _funnel_fixture(spark, tmp_path, "replay")
    f(b0, 0)
    f(b1, 1)
    surv_before, v_before = _state(spark, wh)

    f(b1, 1)  # replay
    surv_after, v_after = _state(spark, wh)
    assert surv_after == surv_before
    assert v_after == v_before, "replay created commits"


def test_stream_funnel_recovers_from_crash_mid_commit_chain(spark, tmp_path):
    """Crash AFTER the survivors commit but BEFORE the index appends,
    then replay: index reads filter batch_id < current, so the replayed
    recompute is identical, the survivors marker skips, and the
    remaining index appends complete — converging to the no-crash
    state exactly."""
    ref_f, ref_wh, b0, b1 = _funnel_fixture(spark, tmp_path, "ref")
    ref_f(b0, 0)
    ref_f(b1, 1)
    want_surv, want_v = _state(spark, ref_wh)

    f, wh, b0, b1 = _funnel_fixture(spark, tmp_path, "crash")
    f(b0, 0)
    orig = f._guarded_append

    def boom(name, key, batch_id, frame, extra=None):
        if name == "cf_fp":
            raise RuntimeError("simulated crash before index appends")
        return orig(name, key, batch_id, frame, extra)

    f._guarded_append = boom
    with pytest.raises(RuntimeError, match="simulated crash"):
        f(b1, 1)
    # survivors committed, fingerprint indexes stale — the crash window
    surv_mid, v_mid = _state(spark, wh)
    assert surv_mid == want_surv
    assert v_mid["cf_fp"] < want_v["cf_fp"]

    f._guarded_append = orig
    f(b1, 1)  # recovery replay
    assert _state(spark, wh) == (want_surv, want_v)


def test_stream_funnel_rejects_out_of_order_batches(spark, tmp_path):
    """The ordered-ingestion guard is fail-loud: a NEW batch whose min
    doc_id is at or below the ingested high-water mark must be refused
    (silently processing it would diverge from the min-doc_id batch
    semantics the shared oracle encodes)."""
    f, wh, b0, b1 = _funnel_fixture(spark, tmp_path, "order")
    f(b1, 0)  # ingest the HIGH half first
    with pytest.raises(RuntimeError, match="out-of-order"):
        f(b0, 1)


def test_stream_funnel_retro_decontamination(spark, tmp_path):
    """An eval-destined document arriving AFTER a training survivor it
    contaminates must trigger the retroactive copy-on-write delete: the
    survivor is in the table after its own batch and GONE after the
    eval doc's batch — the final state matches the one-shot funnel for
    any batch placement of the eval docs."""
    from iceberg_loader_spark.operators.dedup import CurationStreamFunnel
    from iceberg_loader_spark.tables import Warehouse

    wh = Warehouse(str(tmp_path / "wh_retro"))
    f = CurationStreamFunnel(spark, wh)
    empty = spark.createDataFrame(
        [], "doc_id bigint, lang string, n_chars int, text string"
    )
    f.seed(
        empty.selectExpr("md5(text) AS h"),
        spark.createDataFrame([], "simhash bigint"),
        spark.createDataFrame([], "g string"),
    )
    shared = " ".join(f"tok{i}" for i in range(30))  # >= 20 tokens, 5-grams
    mk = lambda i, txt: (i, "en", len(txt), txt)  # noqa: E731
    schema = "doc_id bigint, lang string, n_chars int, text string"
    # doc 1001: train (1001 % 10 != 0), passes quality gates
    b0 = spark.createDataFrame([mk(1001, shared + " unique tail one")], schema)
    # doc 2000: eval-destined (2000 % 10 == 0), shares 5-grams with 1001
    b1 = spark.createDataFrame([mk(2000, shared + " other ending two")], schema)
    f(b0, 0)
    surv0 = wh.load_table("db.cf_surv").scan(spark).count()
    assert surv0 == 1, "train doc should survive its own batch"
    f(b1, 1)
    assert wh.load_table("db.cf_surv").scan(spark).count() == 0, (
        "late-arriving eval doc must retroactively delete the "
        "contaminated survivor"
    )


# ---- round 9: out-of-order reconciliation --------------------------------


def test_stream_funnel_reconcile_shuffled_equals_ordered(spark, tmp_path):
    """late_policy='reconcile': ingesting the HIGH doc_id half first and
    the low half late must converge to exactly the ordered run's final
    state — survivor rows AND per-stage counts (min-doc_id keeper
    re-election with retroactive CoW correction of displaced
    incumbents)."""
    from iceberg_loader_spark.operators.dedup import CurationStreamFunnel

    ref_f, ref_wh, b0, b1 = _funnel_fixture(spark, tmp_path, "ord")
    ref_f(b0, 0)
    ref_f(b1, 1)
    want_surv, _ = _state(spark, ref_wh)
    want_result = sorted(map(tuple, ref_f.result().collect()))

    f, wh, b0, b1 = _funnel_fixture(spark, tmp_path, "shuf")
    f.late_policy = "reconcile"
    f(b1, 0)  # high half FIRST
    f(b0, 1)  # low half LATE
    got_surv, _ = _state(spark, wh)
    assert got_surv == want_surv
    assert sorted(map(tuple, f.result().collect())) == want_result


def test_stream_funnel_reconcile_replay_and_crash_recovery(spark, tmp_path):
    """Reconcile mode keeps the exactly-once contracts: replaying a
    fully committed late batch changes nothing (not even versions —
    the displacement delete intersects the live survivor set), and a
    crash between the survivors commit and the index appends recovers
    to the no-crash state."""
    import pytest as _pt

    ref_f, ref_wh, b0, b1 = _funnel_fixture(spark, tmp_path, "rref")
    ref_f.late_policy = "reconcile"
    ref_f(b1, 0)
    ref_f(b0, 1)
    want_surv, want_v = _state(spark, ref_wh)

    f, wh, b0, b1 = _funnel_fixture(spark, tmp_path, "rcrash")
    f.late_policy = "reconcile"
    f(b1, 0)
    orig = f._guarded_append

    def boom(name, key, batch_id, frame, extra=None):
        if name == "cf_fp":
            raise RuntimeError("simulated crash before index appends")
        return orig(name, key, batch_id, frame, extra)

    f._guarded_append = boom
    with _pt.raises(RuntimeError, match="simulated crash"):
        f(b0, 1)  # late batch crashes mid-chain
    f._guarded_append = orig
    f(b0, 1)  # recovery replay
    surv, v = _state(spark, wh)
    assert surv == want_surv
    f(b0, 1)  # full replay of the committed late batch
    surv2, v2 = _state(spark, wh)
    assert surv2 == want_surv
    assert v2 == v, "replay of a committed late batch created commits"


def test_stream_funnel_reconcile_displacement_semantics(spark, tmp_path):
    """Keeper re-election at both dedup levels: a late smaller-id exact
    duplicate displaces the ingested keeper; a late smaller-id SAME-
    SIMHASH near-duplicate displaces too; a late eval-destined exact
    duplicate displaces the keeper AND leaves no survivor (it is
    eval)."""
    from iceberg_loader_spark.operators.dedup import CurationStreamFunnel
    from iceberg_loader_spark.tables import Warehouse

    wh = Warehouse(str(tmp_path / "wh_disp"))
    f = CurationStreamFunnel(spark, wh, late_policy="reconcile")
    empty = spark.createDataFrame(
        [], "doc_id bigint, lang string, n_chars int, text string"
    )
    f.seed(
        empty.selectExpr("md5(text) AS h"),
        spark.createDataFrame([], "simhash bigint"),
        spark.createDataFrame([], "g string"),
    )
    toks = [f"tok{i}" for i in range(30)]
    x = " ".join(toks)  # exact-dup text
    x_rev = " ".join(reversed(toks))  # same token SET -> same simhash
    ytoks = [f"y{i}" for i in range(30)]
    y = " ".join(ytoks)
    mk = lambda i, txt: (i, "en", len(txt), txt)  # noqa: E731
    schema = "doc_id bigint, lang string, n_chars int, text string"
    # batch 0 (high ids first): 2001 keeps x; 3005 keeps y (reversed)
    f(spark.createDataFrame([mk(2001, x), mk(3005, y)], schema), 0)
    assert {
        r.doc_id
        for r in wh.load_table("db.cf_surv").scan(spark).collect()
    } == {2001, 3005}
    # batch 1 (late): 1001 exact-dups x (displaces 2001); 1003 has y's
    # token set in another order (same simhash, displaces 3005)
    y_rev = " ".join(reversed(ytoks))
    f(spark.createDataFrame([mk(1001, x), mk(1003, y_rev)], schema), 1)
    assert {
        r.doc_id
        for r in wh.load_table("db.cf_surv").scan(spark).collect()
    } == {1001, 1003}
    # batch 2 (later still): 1000 exact-dups x and is EVAL-destined —
    # displaces 1001 and, being eval, survives nowhere; its grams also
    # retro-contaminate nothing else here
    f(spark.createDataFrame([mk(1000, x)], schema), 2)
    assert {
        r.doc_id
        for r in wh.load_table("db.cf_surv").scan(spark).collect()
    } == {1003}


# ---- winnowing window tradeoff -------------------------------------------


def test_winnowing_tradeoff_monotone_in_window(spark):
    """Larger windows select fewer prints (density falls), can only
    shrink the candidate set's print support, and every row must be
    internally consistent with a shared non-vacuous truth set."""
    rows = {
        r.w: r
        for r in QUERIES["winnowing_window_tradeoff"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(rows) == {4, 8, 16}
    truths = {r.n_true for r in rows.values()}
    assert len(truths) == 1, "truth denominator must not depend on w"
    assert truths.pop() >= 1, "vacuous tradeoff: no ground-truth pairs"
    for r in rows.values():
        assert 0 <= r.n_hit <= min(r.n_true, r.n_pairs)
        assert 0 < r.density_bps <= 10000
        # measured density never exceeds the theoretical 2/(w+1) cover
        # bound by more than rounding (value-dedup only lowers it)
        assert r.density_bps <= (2 * 10000) // (r.w + 1) + 1
    assert rows[4].n_prints > rows[8].n_prints > rows[16].n_prints
    assert rows[4].density_bps > rows[8].density_bps > rows[16].density_bps


# ---- local-cluster executor smoke (opt-in: real executor processes) ------


import os as _os

import pytest as _pytest


@_pytest.mark.skipif(
    not _os.environ.get("ILS_LOCAL_CLUSTER"),
    reason="multi-process executor smoke is opt-in (ILS_LOCAL_CLUSTER=1): "
    "it launches real executor JVMs and takes minutes; "
    "tools/local_cluster_smoke.py runs the full top-20 sweep",
)
def test_local_cluster_smoke_small():
    """Three serialization-heavy queries + the DataSource batch/stream
    paths under local-cluster[2,4,2048] — closures, broadcasts, and
    Python workers all cross real process boundaries."""
    from tools.local_cluster_smoke import run

    summary = run(0, SF_SMOKE)  # ALWAYS list + DataSource only
    assert summary["ok"], {
        k: v for k, v in summary["results"].items() if not v.get("ok")
    }


# ---- incremental BM25 + IVF staleness ------------------------------------


def test_incremental_bm25_equals_full_corpus(spark):
    """Raw-count indexes compose: (historical index ∪ batch) must
    reproduce the full-corpus BM25 top-10 bit-for-bit — same docs, same
    fixed-point scores, same ranks."""
    inc = [
        tuple(r)
        for r in QUERIES["incremental_bm25_topk"](spark, SF_SMOKE).collect()
    ]
    full = [
        tuple(r)
        for r in QUERIES["bm25_topk_docs"](spark, SF_SMOKE).collect()
    ]
    assert inc == full
    assert len(inc) == 10


def test_ivf_staleness_rows_are_consistent(spark):
    """Both configs share one non-vacuous exact-truth denominator and
    every count is internally consistent; the recall DELTA itself is the
    measurement and deliberately unpinned."""
    rows = {
        r.config: r
        for r in QUERIES["ivf_staleness_recall"](spark, SF_SMOKE).collect()
    }
    assert set(rows) == {"full", "hist"}
    n_exact = {r.n_exact for r in rows.values()}
    assert len(n_exact) == 1 and n_exact.pop() >= 1
    for r in rows.values():
        assert 0 <= r.n_hits <= r.n_exact
        assert r.recall_bps == (10000 * r.n_hits) // r.n_exact


# ---- packing length tradeoff + token budget sampler ----------------------


def test_packing_tradeoff_monotone_in_length(spark):
    """Longer sequences can only reduce bins, boundary crossings, and
    fragments, and (with fixed content) tail padding is bounded by
    n_sources * L; every row is internally consistent."""
    rows = {
        r.seq_len: r
        for r in QUERIES["packing_length_tradeoff"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(rows) == {512, 1024, 2048}
    docs = {r.n_docs for r in rows.values()}
    assert len(docs) == 1 and docs.pop() >= 1
    assert rows[512].n_bins >= rows[1024].n_bins >= rows[2048].n_bins
    assert (
        rows[512].n_crossing
        >= rows[1024].n_crossing
        >= rows[2048].n_crossing
    )
    assert (
        rows[512].n_fragments
        >= rows[1024].n_fragments
        >= rows[2048].n_fragments
    )
    for r in rows.values():
        assert r.n_fragments >= r.n_docs  # every doc is >= 1 fragment
        assert 0 <= r.padding_toks < r.n_bins * r.seq_len
        assert r.crossing_bps == (10000 * r.n_crossing) // r.n_docs


def test_token_budget_sample_respects_take_until(spark):
    """Per source: kept counts are bounded, and toks_kept reaches the
    budget whenever the source HAS that many tokens (take-until: the
    last kept doc may overshoot, so fill can exceed 10000 bps)."""
    rows = QUERIES["token_budget_sample"](spark, SF_SMOKE).collect()
    assert len(rows) >= 1
    for r in rows:
        assert 0 < r.n_docs_kept <= r.n_docs_total
        assert r.budget_fill_bps == (10000 * r.toks_kept) // 20_000
        if r.n_docs_kept < r.n_docs_total:
            # budget binds: we stopped early, so the budget was reached
            assert r.toks_kept >= 20_000
