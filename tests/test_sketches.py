"""Semantic contracts of the self-auditing sketch operators — the
guarantees the oracle hash-match alone doesn't state:

* Count-Min NEVER underestimates (one-sided error, Cormode &
  Muthukrishnan 2005, Thm 1).
* A Bloom filter NEVER produces a false negative (Bloom 1970).
* The audit verdict columns the queries emit agree with those laws.
"""

from __future__ import annotations

from iceberg_loader_spark.operators.relational import bloom_prefilter_orders
from iceberg_loader_spark.operators.similarity import (
    knn_label_audit,
    matryoshka_recall,
)
from iceberg_loader_spark.operators.text import countmin_heavy_hitters
from tests.conftest import SF_SMOKE


def test_countmin_one_sided_error(spark):
    rows = countmin_heavy_hitters(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cm_est >= r.exact_cnt, r
        assert r.est_err == r.cm_est - r.exact_cnt
        assert r.overestimate_ok is True


def test_bloom_no_false_negatives(spark):
    r = bloom_prefilter_orders(spark, SF_SMOKE).collect()[0]
    assert r.n_false_neg == 0
    # every true member must pass the filter
    assert r.n_bloom_hits >= r.n_members
    assert r.n_bloom_hits == r.n_members + r.n_false_pos
    assert 0 <= r.fp_rate_bps <= 10000


def test_knn_label_audit_vote_bounds(spark):
    rows = knn_label_audit(spark, SF_SMOKE).collect()
    assert rows, "every vector shares a cell with someone at this scale"
    for r in rows:
        assert 1 <= r.n_votes <= 3
        assert r.suspect == (r.maj_label != r.label)


def test_matryoshka_recall_bounds(spark):
    rows = matryoshka_recall(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.k == 3
        assert 0 <= r.n_hits <= 3
