"""Round-5 invariants: deletion-neighborhood blocking recall and
incremental-MinHash equivalence to the full-corpus run."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

QUERIES = entrymod.queries()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _deletion_variants(s: str) -> set[str]:
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab#", min_size=0, max_size=6),
        min_size=2,
        max_size=8,
        unique=True,
    )
)
def test_deletion_blocking_has_full_recall_for_lev1(names):
    """The recall guarantee the operator's docstring claims, proven over
    random strings (including empties, repeats-after-delete, indels —
    not just the fixed-width templated names in the testdata): every
    pair within levenshtein <= 1 shares at least one deletion variant."""
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            if _lev(a, b) <= 1:
                assert _deletion_variants(a) & _deletion_variants(b), (a, b)


def test_incremental_minhash_equals_full_run_restriction(spark):
    """The incremental operator (persisted index + new-batch-only
    pipeline) must produce EXACTLY the full-corpus operator's candidate
    pairs restricted to pairs touching at least one new document — the
    signatures are identical whether loaded from the index or computed,
    and the hot-bucket cap sees the same unioned band frame."""
    import hashlib

    def is_new(doc_id: int) -> bool:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return int(h[:8], 16) % 100 >= 50

    full = {
        (r.a_id, r.b_id): r.n_match
        for r in QUERIES["minhash_lsh_candidates"](spark, SF_SMOKE).collect()
        if is_new(r.a_id) or is_new(r.b_id)
    }
    inc = {
        (r.a_id, r.b_id): r.n_match
        for r in QUERIES["incremental_minhash_candidates"](
            spark, SF_SMOKE
        ).collect()
    }
    assert inc == full


def test_incremental_minhash_pair_kinds(spark):
    """pair_kind must agree with the bucket split of the ids."""
    import hashlib

    def is_new(doc_id: int) -> bool:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return int(h[:8], 16) % 100 >= 50

    rows = QUERIES["incremental_minhash_candidates"](
        spark, SF_SMOKE
    ).collect()
    assert rows
    for r in rows:
        want = "new_new" if (is_new(r.a_id) and is_new(r.b_id)) else "new_old"
        assert r.pair_kind == want, (r.a_id, r.b_id)
        assert is_new(r.a_id) or is_new(r.b_id)


def _is_new(doc_id: int) -> bool:
    import hashlib

    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return int(h[:8], 16) % 100 >= 50


def test_incremental_winnowing_equals_full_run_restriction(spark):
    """Persisted print index + new-batch-only fingerprinting must produce
    EXACTLY the full-corpus operator's pairs (with identical shared-print
    counts and per-doc print sizes) restricted to pairs touching at
    least one new document."""
    full = {
        (r.a_key, r.b_key): (r.n_shared, r.n_fp_a, r.n_fp_b)
        for r in QUERIES["winnowing_neardup_pairs"](spark, SF_SMOKE).collect()
        if _is_new(r.a_key) or _is_new(r.b_key)
    }
    inc = {}
    for r in QUERIES["incremental_winnowing_candidates"](
        spark, SF_SMOKE
    ).collect():
        inc[(r.a_key, r.b_key)] = (r.n_shared, r.n_fp_a, r.n_fp_b)
        want = "new_new" if (_is_new(r.a_key) and _is_new(r.b_key)) else "new_old"
        assert r.pair_kind == want
    assert inc == full


def test_incremental_spans_equals_full_run_restriction(spark):
    """Persisted anchor index + new-batch-only anchoring must reproduce
    the full-corpus maximal-run geometry (max span AND run count) for
    every pair touching a new document — the orientation re-mapping
    (least/greatest + diagonal flip) must not perturb the islands."""
    full = {
        (r.a_key, r.b_key): (r.max_span_tokens, r.n_runs)
        for r in QUERIES["cross_doc_span_pairs"](spark, SF_SMOKE).collect()
        if _is_new(r.a_key) or _is_new(r.b_key)
    }
    inc = {}
    for r in QUERIES["incremental_span_candidates"](
        spark, SF_SMOKE
    ).collect():
        inc[(r.a_key, r.b_key)] = (r.max_span_tokens, r.n_runs)
        want = "new_new" if (_is_new(r.a_key) and _is_new(r.b_key)) else "new_old"
        assert r.pair_kind == want
    assert inc == full


def test_incremental_simhash_equals_full_run_restriction(spark):
    """The one-bigint-per-doc index variant must reproduce the
    full-corpus half-key LSH pairs (with identical hamming distances)
    restricted to pairs touching at least one new document."""
    full = {
        (r.a_id, r.b_id): r.hamming
        for r in QUERIES["simhash_neardup_pairs"](spark, SF_SMOKE).collect()
        if _is_new(r.a_id) or _is_new(r.b_id)
    }
    inc = {}
    for r in QUERIES["incremental_simhash_candidates"](
        spark, SF_SMOKE
    ).collect():
        inc[(r.a_id, r.b_id)] = r.hamming
        want = "new_new" if (_is_new(r.a_id) and _is_new(r.b_id)) else "new_old"
        assert r.pair_kind == want
    assert inc == full


def test_incremental_embedding_neardup_equals_full_run_restriction(spark):
    """Scalar-only bucket index + payload fetch must reproduce the
    full-corpus sign-LSH near-dup pairs (with identical cosines)
    restricted to pairs touching at least one new vector."""
    import hashlib

    def vec_is_new(vec_id: int) -> bool:
        h = hashlib.md5(str(vec_id).encode()).hexdigest()
        return int(h[:8], 16) % 100 >= 50

    full = {
        (r.a_id, r.b_id): (r.a_label, r.b_label, r.cosine)
        for r in QUERIES["embedding_neardup_lsh"](spark, SF_SMOKE).collect()
        if vec_is_new(r.a_id) or vec_is_new(r.b_id)
    }
    inc = {}
    for r in QUERIES["incremental_embedding_neardup"](
        spark, SF_SMOKE
    ).collect():
        inc[(r.a_id, r.b_id)] = (r.a_label, r.b_label, r.cosine)
        want = (
            "new_new"
            if (vec_is_new(r.a_id) and vec_is_new(r.b_id))
            else "new_old"
        )
        assert r.pair_kind == want
    assert inc == full


def _winnow_prints(tokens: list[str], k: int, w: int) -> set[str]:
    """Pure-Python mirror of the operator's winnowing math: md5 of
    space-joined k-grams, then the min hash of every w-window."""
    import hashlib

    if len(tokens) < k:
        return set()
    hs = [
        hashlib.md5(" ".join(tokens[i : i + k]).encode()).hexdigest()
        for i in range(len(tokens) - k + 1)
    ]
    if len(hs) < w:
        return set()
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.sampled_from("abcdefgh"), min_size=12, max_size=30),
    st.lists(st.sampled_from("qrstuv"), min_size=0, max_size=8),
    st.lists(st.sampled_from("wxyz"), min_size=0, max_size=8),
)
def test_winnowing_guaranteed_cover_property(shared, pre, post):
    """Schleimer et al. 2003, theorem the operator's docstring leans on:
    two documents sharing a token run of >= w + k - 1 tokens share at
    least one winnowing-selected print (k=5, w=4 — the operator's
    parameters). Proven over random contexts: the shared run embedded
    in different prefixes/suffixes must still collide."""
    K, W = 5, 4
    assert len(shared) >= W + K - 1
    a = pre + shared + post
    b = list(reversed(post)) + shared + list(reversed(pre))
    pa = _winnow_prints(a, K, W)
    pb = _winnow_prints(b, K, W)
    assert pa & pb, (a, b)
