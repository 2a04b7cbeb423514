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


# -- property pin: the fenced-replace scheme IS greedy BPE application ----
# str.replace, Java's String.replace (Spark F.replace), and DuckDB's
# replace all substitute non-overlapping occurrences left-to-right, so a
# pure-Python simulation of the fenced scheme is a faithful model of what
# both engines execute.

def _fence(symbols: list[str]) -> str:
    return "|" + "||".join(symbols) + "|"


def _unfence(sym: str) -> list[str]:
    return sym.strip("|").split("||")


def _fenced_apply(sym: str, a: str, b: str) -> str:
    return sym.replace(f"|{a}||{b}|", f"|{a}{b}|")


def _reference_apply(symbols: list[str], a: str, b: str) -> list[str]:
    """Textbook greedy left-to-right BPE merge over a symbol list."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def test_fenced_apply_matches_reference_bpe_exhaustively():
    """Every word over a 2-letter alphabet up to length 8, merged by every
    pair reachable in 2 rounds — fenced replace must equal the textbook
    greedy merge at each step (exhaustive, no sampling)."""
    from itertools import product

    alphabet = "ab"
    for n in range(1, 9):
        for word in product(alphabet, repeat=n):
            symbols = list(word)
            sym = _fence(symbols)
            for a1, b1 in product(alphabet, repeat=2):
                ref1 = _reference_apply(symbols, a1, b1)
                got1 = _fenced_apply(sym, a1, b1)
                assert _unfence(got1) == ref1, (word, (a1, b1))
                # a second round over the (possibly multi-char) symbols —
                # the boundary-crossing corner lives here
                seen = {s for s in ref1}
                for a2 in seen:
                    for b2 in seen:
                        assert _unfence(_fenced_apply(got1, a2, b2)) == (
                            _reference_apply(ref1, a2, b2)
                        ), (word, (a1, b1), (a2, b2))


def test_pipe_tokens_excluded_from_vocab(spark, tmp_path):
    """Tokens containing a literal '|' must never reach the vocabulary:
    the fence delimiter IS '|', so an in-token pipe would read as a
    symbol boundary and let merges cross symbol edges (latent on the
    driver corpus, which has no pipes)."""
    import pandas as pd

    from iceberg_loader_spark.operators.text import _bpe_vocab_frames

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["hello a|b world", "hello |x| plain world"],
            "lang": ["en", "en"],
            "source": ["s1", "s1"],
            "n_chars": [15, 21],
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    wsrc, vocab = _bpe_vocab_frames(spark, str(tmp_path))
    toks = {r.tok for r in vocab.select("tok").collect()}
    assert toks == {"hello", "world", "plain"}
    assert all("|" not in r.tok for r in wsrc.select("tok").collect())
    # surviving syms are well-formed fences: every interior char doubled
    for r in vocab.collect():
        body = r.sym.strip("|").split("||")
        assert "".join(body) == r.tok
