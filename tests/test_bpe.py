"""BPE trainer unit tests (operators/text.py): the boundary-fenced merge
application must behave exactly like textbook greedy BPE — in particular
a learned MULTI-CHAR symbol must never be split by a later merge whose
pair happens to be a literal substring of it."""

from __future__ import annotations

from pyspark.sql import functions as F


def _vocab(spark, words: dict[str, int]):
    """(tok, freq, sym) frame with the fenced symbol encoding."""
    df = spark.createDataFrame(
        list(words.items()), "tok string, freq long"
    )
    return df.select(
        "tok",
        "freq",
        F.concat(
            F.lit("|"),
            F.rtrim(F.regexp_replace(F.col("tok"), "(.)", "$1||"), F.lit("|")),
            F.lit("|"),
        ).alias("sym"),
    )


def test_merge_cannot_cross_symbol_boundaries(spark):
    """Round 1 merges (r,k) -> 'rk'. Round 2 merges (a,r) — which is a
    literal substring of '|a||rk|' under a boundary-blind replace. The
    fenced encoding must leave 'a','rk' intact, so round 3's top pair is
    (a, rk), proving the multi-char symbol survived."""
    from iceberg_loader_spark.operators.text import _bpe_rounds

    vocab = _vocab(spark, {"ark": 3, "rk": 5, "ar": 4})
    merges, words = _bpe_rounds(vocab, n_rounds=3)
    got = [
        (r.a, r.b, r.cnt) for m in merges for r in m.collect()
    ]
    # round 1: (r,k)=3+5=8 beats (a,r)=3+4=7; round 2: (a,r)=4 from 'ar'
    # only — 'ark' is now a||rk; round 3: (a,rk)=3 survives IF the round-2
    # replace respected the boundary
    assert got == [("r", "k", 8), ("a", "r", 4), ("a", "rk", 3)]
    syms = {r.tok: r.sym for r in words.collect()}
    assert syms == {"ark": "|ark|", "rk": "|rk|", "ar": "|ar|"}


def test_merge_application_is_greedy_left_to_right(spark):
    """'aaaa' under merge (a,a): greedy left-to-right pairs up as
    (aa)(aa), never the overlapping a(aa)a."""
    from iceberg_loader_spark.operators.text import _bpe_rounds

    vocab = _vocab(spark, {"aaaa": 2, "aaa": 3})
    merges, words = _bpe_rounds(vocab, n_rounds=1)
    [(a, b, cnt)] = [(r.a, r.b, r.cnt) for r in merges[0].collect()]
    assert (a, b, cnt) == ("a", "a", 2 * 3 + 3 * 2)
    syms = {r.tok: r.sym for r in words.collect()}
    assert syms == {"aaaa": "|aa||aa|", "aaa": "|aa||a|"}


def test_apply_last_false_skips_final_rewrite(spark):
    from iceberg_loader_spark.operators.text import _bpe_rounds

    vocab = _vocab(spark, {"ab": 2, "abc": 1})
    merges, words = _bpe_rounds(vocab, n_rounds=2, apply_last=False)
    assert len(merges) == 2
    # the returned vocab reflects only round 1's merge
    syms = {r.tok: r.sym for r in words.collect()}
    assert syms == {"ab": "|ab|", "abc": "|ab||c|"}
