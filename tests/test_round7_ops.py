"""Round-7 operator invariants: properties the oracle hash can't state
directly (non-vacuity floors, cross-threshold monotonicity)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

QUERIES = entrymod.queries()


def test_lsh_candidate_recall_is_non_vacuous_and_monotone(spark):
    """The LSH recall audit must measure something real: at sf0.01 the
    planted near-dups guarantee true pairs at both thresholds, counts
    must be monotone non-increasing in the threshold, hits can never
    exceed truths, and recall_bps must be a valid basis-point value
    (the -1 'no truth pairs' sentinel would mean a vacuous audit)."""
    rows = {
        r.threshold_bps: r
        for r in QUERIES["lsh_candidate_recall"](spark, SF_SMOKE).collect()
    }
    assert set(rows) == {5000, 8000}
    for r in rows.values():
        assert r.n_true >= 1, "vacuous recall audit: no ground-truth pairs"
        assert 0 <= r.n_hit <= r.n_true
        assert 0 <= r.recall_bps <= 10000
        assert r.recall_bps == (10000 * r.n_hit) // r.n_true
    # a pair with Jaccard >= 0.8 also has Jaccard >= 0.5
    assert rows[8000].n_true <= rows[5000].n_true
    assert rows[8000].n_hit <= rows[5000].n_hit


def test_band_tradeoff_subset_chain(spark):
    """2x4 candidates ⊆ 4x2 ⊆ 8x1 by construction (matching 4
    consecutive hashes implies matching both aligned 2-hash bands;
    matching a 2-hash band implies matching both single-hash bands), so
    candidate and hit counts must be monotone across the configs, the
    truth denominator identical, and every count internally consistent."""
    rows = {
        r.config: r
        for r in QUERIES["minhash_band_tradeoff"](spark, SF_SMOKE).collect()
    }
    assert set(rows) == {"2x4", "4x2", "8x1"}
    n_true = {r.n_true for r in rows.values()}
    assert len(n_true) == 1 and n_true.pop() >= 1
    for r in rows.values():
        assert 0 <= r.n_hit <= min(r.n_true, r.n_candidates)
        assert 0 <= r.recall_bps <= 10000
        assert 0 <= r.precision_bps <= 10000
    assert rows["2x4"].n_candidates <= rows["4x2"].n_candidates
    assert rows["4x2"].n_candidates <= rows["8x1"].n_candidates
    assert rows["2x4"].n_hit <= rows["4x2"].n_hit <= rows["8x1"].n_hit
    assert rows["2x4"].recall_bps <= rows["4x2"].recall_bps
    assert rows["4x2"].recall_bps <= rows["8x1"].recall_bps


def test_stream_incremental_minhash_matches_batch_operator(spark):
    """Batch-invariance: the micro-batch-streamed incremental index run
    must surface EXACTLY the pairs the single-batch incremental operator
    finds (which is itself pinned to the full-corpus restriction) — same
    pair set, same n_match, same pair_kind, regardless of how the
    incoming half was split into micro-batches."""
    streamed = (
        QUERIES["stream_incremental_minhash_candidates"](spark, SF_SMOKE)
        .select("a_id", "b_id", "n_match", "pair_kind")
        .collect()
    )
    batch = (
        QUERIES["incremental_minhash_candidates"](spark, SF_SMOKE)
        .select("a_id", "b_id", "n_match", "pair_kind")
        .collect()
    )
    key = lambda r: (r.a_id, r.b_id)  # noqa: E731
    assert sorted(map(tuple, streamed), key=lambda t: t[:2]) == sorted(
        map(tuple, batch), key=lambda t: t[:2]
    )
    assert len(streamed) >= 1, "vacuous: no incremental pairs at smoke SF"


def _indexer_fixture(spark, tmp_path, tag):
    from iceberg_loader_spark.operators.dedup import (
        MinHashStreamIndexer,
        _incremental_split,
    )
    from iceberg_loader_spark.tables import Warehouse

    hist, inc = _incremental_split(spark, SF_SMOKE)
    wh = Warehouse(str(tmp_path / f"wh_{tag}"))
    ix = MinHashStreamIndexer(spark, wh, cap_val=100)
    ix.seed(hist)
    b0 = inc.filter("doc_id % 2 = 0")
    b1 = inc.filter("doc_id % 2 = 1")
    return ix, wh, b0, b1


def _pairs_set(spark, wh):
    return {
        (r.a_id, r.b_id, r.n_match, r.pair_kind)
        for r in wh.load_table("db.mh_spairs").scan(spark).collect()
    }


def test_stream_indexer_replay_is_idempotent(spark, tmp_path):
    """Replaying a fully committed micro-batch (foreachBatch's
    at-least-once contract) must change NOTHING: both batch-id markers
    skip, so pair rows and index rows stay byte-identical."""
    ix, wh, b0, b1 = _indexer_fixture(spark, tmp_path, "replay")
    ix(b0, 0)
    ix(b1, 1)
    pairs_before = _pairs_set(spark, wh)
    idx_before = wh.load_table("db.mh_sindex").scan(spark).count()
    v_pairs = wh.load_table("db.mh_spairs").meta.current_version()
    v_idx = wh.load_table("db.mh_sindex").meta.current_version()

    ix(b1, 1)  # replay
    assert _pairs_set(spark, wh) == pairs_before
    assert wh.load_table("db.mh_sindex").scan(spark).count() == idx_before
    # no new commits landed at all
    assert wh.load_table("db.mh_spairs").meta.current_version() == v_pairs
    assert wh.load_table("db.mh_sindex").meta.current_version() == v_idx


def test_stream_indexer_recovers_from_crash_between_appends(spark, tmp_path):
    """Crash AFTER the pairs commit but BEFORE the index append, then
    replay: the pairs marker skips the recompute (so the batch can never
    pair against an index already containing it) and the index append
    completes — converging to exactly the no-crash outcome."""
    ref_ix, ref_wh, b0, b1 = _indexer_fixture(spark, tmp_path, "ref")
    ref_ix(b0, 0)
    ref_ix(b1, 1)
    want_pairs = _pairs_set(spark, ref_wh)
    want_idx = ref_wh.load_table("db.mh_sindex").scan(spark).count()

    ix, wh, b0, b1 = _indexer_fixture(spark, tmp_path, "crash")
    ix(b0, 0)
    orig = ix._append_index

    def boom(batch_sigs, batch_id):
        raise RuntimeError("simulated crash before index append")

    ix._append_index = boom
    try:
        ix(b1, 1)
    except RuntimeError:
        pass
    # pairs committed, index stale — exactly the documented crash window
    assert _pairs_set(spark, wh) == want_pairs
    assert wh.load_table("db.mh_sindex").scan(spark).count() < want_idx

    ix._append_index = orig
    ix(b1, 1)  # recovery replay
    assert _pairs_set(spark, wh) == want_pairs
    assert wh.load_table("db.mh_sindex").scan(spark).count() == want_idx


def test_incremental_funnel_stage_invariants(spark):
    """Funnel algebra: stage counts monotone non-increasing through
    6_decontam, split buckets partition the decontam survivors exactly,
    and every gate does real work at smoke scale (non-vacuity — a filter
    that silently stopped filtering would leave a stage count equal to
    its predecessor all the way down)."""
    c = {
        r.stage: r.n_docs
        for r in QUERIES["incremental_curation_funnel_counts"](
            spark, SF_SMOKE
        ).collect()
    }
    order = [
        "1_incoming", "2_quality", "3_lang",
        "4_exact_vs_index", "5_neardup_vs_index", "6_decontam",
    ]
    assert set(c) == set(order) | {"7_train", "8_val", "9_test"}
    for a, b in zip(order, order[1:]):
        assert c[a] >= c[b], (a, b, c)
    assert c["7_train"] + c["8_val"] + c["9_test"] == c["6_decontam"]
    assert c["1_incoming"] >= 1 and c["6_decontam"] >= 1
    # the index gates must actually fire at smoke scale: the planted
    # near-dups guarantee cross-half simhash collisions
    assert c["5_neardup_vs_index"] < c["4_exact_vs_index"]


def test_simhash_threshold_tradeoff_invariants(spark):
    """Monotonicity in the threshold (within/surfaced counts can only
    grow), surfaced <= within <= true, valid bps everywhere, and
    non-vacuity: the planted near-dups guarantee within-threshold pairs
    at the production threshold (6)."""
    rows = {
        r.threshold: r
        for r in QUERIES["simhash_threshold_tradeoff"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(rows) == {2, 6, 10}
    n_true = {r.n_true for r in rows.values()}
    assert len(n_true) == 1 and n_true.pop() >= 1
    for r in rows.values():
        assert 0 <= r.n_surfaced <= r.n_within <= r.n_true
        assert -1 <= r.coverage_bps <= 10000
        assert -1 <= r.block_recall_bps <= 10000
    assert rows[2].n_within <= rows[6].n_within <= rows[10].n_within
    assert rows[2].n_surfaced <= rows[6].n_surfaced <= rows[10].n_surfaced
    assert rows[6].n_within >= 1
