"""The synthetic scale-decade generator's contract: deterministic,
copy-count-exact, and CONTENT-INDEPENDENT across copies — the property
that makes the second-decade measurement see the operator, not the copy
scheme (a naive x10 copy inflates candidate-pair mass quadratically)."""

from __future__ import annotations

import duckdb
import pytest

from tools.gen_scale_decade import ID_OFF, generate

pytestmark = pytest.mark.requires_testdata


def _gen(tmp_path, name, copies):
    out = str(tmp_path / name)
    generate(out, copies=copies)
    return out


def test_decade_counts_and_determinism(tmp_path):
    a = _gen(tmp_path, "a", 2)
    b = _gen(tmp_path, "b", 2)
    for t in ("documents", "embeddings", "events"):
        n_src = duckdb.sql(
            f"SELECT count(*) FROM '/root/testdata/sf0.1/{t}.parquet'"
        ).fetchone()[0]
        n_a = duckdb.sql(f"SELECT count(*) FROM '{a}/{t}.parquet'").fetchone()[0]
        assert n_a == 2 * n_src, t
        # byte-level determinism would over-pin parquet internals; row-set
        # equality is the contract
        diff = duckdb.sql(
            f"SELECT count(*) FROM ((SELECT * FROM '{a}/{t}.parquet')"
            f" EXCEPT (SELECT * FROM '{b}/{t}.parquet'))"
        ).fetchone()[0]
        assert diff == 0, f"{t} not deterministic"


def test_decade_duplicate_structure_scales_linearly(tmp_path):
    out = _gen(tmp_path, "lin", 3)

    def pairs(path):
        return duckdb.sql(
            f"SELECT COALESCE(sum(c*(c-1)//2), 0) FROM ("
            f"  SELECT count(*) c FROM '{path}/documents.parquet'"
            f"  GROUP BY md5(text))"
        ).fetchone()[0]

    src_pairs = pairs("/root/testdata/sf0.1")
    assert src_pairs > 0, "vacuous: source has no exact duplicates"
    assert pairs(out) == 3 * src_pairs  # linear, never quadratic

    # zero cross-copy collisions: every md5 group lives in ONE copy
    cross = duckdb.sql(
        f"SELECT count(*) FROM ("
        f"  SELECT count(DISTINCT doc_id // {ID_OFF}) nk"
        f"  FROM '{out}/documents.parquet' GROUP BY md5(text)"
        f"  HAVING nk > 1)"
    ).fetchone()[0]
    assert cross == 0


def test_decade_embeddings_rotate_and_ids_offset(tmp_path):
    out = _gen(tmp_path, "emb", 2)
    row = duckdb.sql(
        f"""
        SELECT a.embedding AS e0, b.embedding AS e1
        FROM '{out}/embeddings.parquet' a
        JOIN '{out}/embeddings.parquet' b ON b.vec_id = a.vec_id + {ID_OFF}
        WHERE a.vec_id = 7
        """
    ).fetchone()
    e0, e1 = list(row[0]), list(row[1])
    assert e1 == e0[1:] + e0[:1]  # left-rotated by k=1, norm-preserving
    lo, hi = duckdb.sql(
        f"SELECT min(vec_id), max(vec_id) FROM '{out}/embeddings.parquet'"
        f" WHERE vec_id >= {ID_OFF}"
    ).fetchone()
    assert lo >= ID_OFF and hi < 2 * ID_OFF


def test_third_decade_copies_past_dimension_stay_decorrelated(tmp_path):
    """Rotation is periodic mod the embedding dimension (64): without a
    second transform axis, copy 64 would be an exact value-level
    duplicate of copy 0 and any >64-copy decade would measure the copy
    scheme's duplicate structure instead of the operator.  Past k=63
    the generator flips the vector's sign (k // 64 odd), landing the
    same-rotation pair at cosine -1 — maximally far for every
    positive-threshold consumer (near-dup, SemDeDup, kNN truth)."""
    out = _gen(tmp_path, "deep", 66)
    rows = duckdb.sql(
        f"""
        SELECT k.k, e.embedding
        FROM (SELECT unnest([0, 1, 64, 65]) AS k) k
        JOIN '{out}/embeddings.parquet' e
          ON e.vec_id = 7 + CAST(k.k AS BIGINT) * {ID_OFF}
        ORDER BY k.k
        """
    ).fetchall()
    e = {k: list(v) for k, v in rows}
    # copy 64 = NEGATED copy 0 (rotation 0, sign flipped), not a dup
    assert e[64] == [-x for x in e[0]]
    # copy 65 = negated rotation-1: same geometry as copy 1, cosine -1
    assert e[65] == [-x for x in e[1]]
    assert e[1] == e[0][1:] + e[0][:1]
    # value-level: no two sampled copies collide exactly
    assert len({tuple(v) for v in e.values()}) == 4
