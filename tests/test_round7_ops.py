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
