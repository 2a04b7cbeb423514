"""Deduplication operators over ``documents`` (SURVEY.md §2 B9/B25).

Exact dedup is a hash-groupBy on a content digest — the canonical 100 TB
recipe (shuffle carries (digest, doc_id) pairs only, never the text).
Near-dup variants (MinHash/LSH, SimHash, n-gram Jaccard) build on a word
n-gram shingle set and md5-based hashing, chosen because DuckDB implements
the identical md5, so every stage has an exact oracle twin.

Determinism: minhash signatures are lexicographic MIN over md5 hex strings
(not ints) — both engines order ASCII hex identically, so no hex→int
conversion ambiguity exists anywhere in the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from iceberg_loader_spark.sources.tables import load_table

QUERIES = {}
ORACLES = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# B9 — exact dedup via content digest. Keeps the smallest doc_id per text.
# Scale: the shuffle key is md5(text) (128-bit uniform → no skew); text
# itself never moves.
# --------------------------------------------------------------------------
@_register(
    "exact_dedup_documents",
    """
    SELECT MD5(text) AS text_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY MD5(text)
    ORDER BY text_hash
    """,
)
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .orderBy("text_hash")
    )


# --------------------------------------------------------------------------
# B9 — exact dedup keyed on a column subset, deterministic keeper via
# row_number (the dropDuplicates(subset) semantics with a pinned winner).
# --------------------------------------------------------------------------
@_register(
    "dedup_events_by_user_type",
    """
    SELECT event_id, user_id, event_type FROM (
      SELECT event_id, user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events)
    WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def dedup_events_by_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type")
        .orderBy("user_id", "event_type")
    )


# --------------------------------------------------------------------------
# Shared shingle/token helpers (Spark side). Tokenization is a plain
# single-space split of lower(text) — DuckDB STRING_SPLIT reproduces it
# byte-for-byte on the ASCII corpus.
# --------------------------------------------------------------------------
def _tokens(col):
    return F.filter(F.split(F.lower(col), " "), lambda t: t != "")


def _shingles3(tokens):
    """Distinct word 3-gram shingles; whole-doc fallback when < 3 tokens."""
    n = F.size(tokens)
    tri = F.transform(
        F.sequence(F.lit(0), n - 3),
        lambda i: F.concat_ws(" ", tokens[i], tokens[i + 1], tokens[i + 2]),
    )
    return F.array_distinct(
        F.when(n >= 3, tri).otherwise(F.array(F.concat_ws(" ", tokens)))
    )


# DuckDB twins (1-based list indexing).
_DUCK_TOKENS = "list_filter(string_split(lower(text), ' '), t -> t <> '')"
_DUCK_SHINGLES3 = (
    "list_distinct(CASE WHEN len(toks) >= 3 THEN "
    "list_transform(range(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) "
    "ELSE [list_aggregate(toks, 'string_agg', ' ')] END)"
)

_N_HASHES = 8  # minhash signature width
_N_BANDS = 4  # LSH bands of 2 hashes each


# --------------------------------------------------------------------------
# B25 — MinHash + LSH fuzzy dedup. Pipeline: word-3-gram shingles →
# 8-wide minhash signature (lexicographic MIN over seeded md5 hex — both
# engines order ASCII hex identically) → 4 bands of 2 → candidate pairs =
# docs sharing any band key → estimated Jaccard = matching-signature
# fraction, kept when ≥ 0.5.
#
# Scale: the only shuffles carry (band_key, doc_id) and (doc_id, signature)
# — never text. Band buckets bound the self-join (no O(n²) pair
# enumeration); the signature re-join is an equi-join on doc_id that AQE
# broadcasts when the candidate set is small.
# --------------------------------------------------------------------------
_DUCK_MINHASH_SIGS = f"""
    sigs AS (
      SELECT doc_id,
             [{', '.join(f"list_min(list_transform(shingles, s -> md5('{h}:' || s)))" for h in range(_N_HASHES))}] AS sig
      FROM (SELECT doc_id, {_DUCK_SHINGLES3} AS shingles
            FROM (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents))
    )
"""


@_register(
    "minhash_lsh_candidates",
    f"""
    WITH {_DUCK_MINHASH_SIGS},
    bands AS (
      SELECT doc_id, band_id, sig[2*band_id + 1] || sig[2*band_id + 2] AS band_key
      FROM sigs, (SELECT unnest(range({_N_BANDS})) AS band_id)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    )
    SELECT p.a_id, p.b_id,
           list_sum(list_transform(range(1, {_N_HASHES + 1}),
                    i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) AS n_match,
           CAST(list_sum(list_transform(range(1, {_N_HASHES + 1}),
                    i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE)
             / {_N_HASHES} AS est_jaccard
    FROM pairs p
    JOIN sigs sa ON sa.doc_id = p.a_id
    JOIN sigs sb ON sb.doc_id = p.b_id
    WHERE list_sum(list_transform(range(1, {_N_HASHES + 1}),
                   i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
          >= {_N_HASHES // 2}
    ORDER BY a_id, b_id
    """,
)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shingled = docs.select(
        "doc_id", _shingles3(_tokens(F.col("text"))).alias("shingles")
    )
    def _seeded_md5(h):
        return lambda s: F.md5(F.concat(F.lit(f"{h}:"), s))

    sigs = shingled.select(
        "doc_id",
        F.array(
            *[
                F.array_min(F.transform(F.col("shingles"), _seeded_md5(h)))
                for h in range(_N_HASHES)
            ]
        ).alias("sig"),
    )
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_id"),
                        F.concat(F.col("sig")[2 * j], F.col("sig")[2 * j + 1]).alias(
                            "band_key"
                        ),
                    )
                    for j in range(_N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("a_id"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("b_id"), F.col("sig").alias("sig_b"))
    n_match = F.aggregate(
        F.zip_with(
            F.col("sig_a"),
            F.col("sig_b"),
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        pairs.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            n_match.alias("n_match"),
            (n_match.cast("double") / _N_HASHES).alias("est_jaccard"),
        )
        .filter(F.col("n_match") >= _N_HASHES // 2)
        .orderBy("a_id", "b_id")
    )


# --------------------------------------------------------------------------
# B25 — SimHash: 32-bit fingerprint. Each distinct token votes ±1 per bit
# position from its md5-derived 32-bit integer; bit set when the vote sum
# is ≥ 0. Map-only per document (no shuffle at all).
# --------------------------------------------------------------------------
_N_SIMHASH_BITS = 32


def _simhash(tokens):
    hs = F.transform(
        tokens,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"),
    )
    # NB: PySpark derives higher-order-function arity from the Python
    # lambda's signature, so per-bit constants must be captured in a
    # closure factory — a `b=b` default arg would add a third lambda var.
    def _vote(b):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    total = F.lit(0).cast("bigint")
    for b in range(_N_SIMHASH_BITS):
        votes = F.aggregate(hs, F.lit(0), _vote(b))
        total = total + F.when(votes >= 0, F.lit(2**b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return total


def _duck_simhash(toks: str) -> str:
    hs = (
        f"list_transform({toks}, t -> "
        "CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT))"
    )
    bits = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> "
        f"CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)) >= 0 "
        f"THEN CAST({2**b} AS BIGINT) ELSE 0 END)"
        for b in range(_N_SIMHASH_BITS)
    )
    return f"(SELECT {bits} FROM (SELECT {hs} AS hs))"


@_register(
    "simhash_documents",
    f"""
    SELECT doc_id,
           {_duck_simhash('toks')} AS simhash,
           lang
    FROM (SELECT doc_id, lang, list_distinct({_DUCK_TOKENS}) AS toks
          FROM documents)
    ORDER BY doc_id
    """,
)
def simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            _simhash(F.array_distinct(_tokens(F.col("text")))).alias("simhash"),
            "lang",
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# B25 — SimHash near-dup pairs: LSH on the two 16-bit halves (near-dups
# agree on at least one half by pigeonhole when hamming ≤ threshold in one
# half), verified by exact hamming distance ≤ 6 via bit_count(xor).
# Scale: the self-join is keyed on 16-bit half values — bounded buckets,
# no O(n²) scan.
# --------------------------------------------------------------------------
@_register(
    "simhash_neardup_pairs",
    f"""
    WITH sh AS (
      SELECT doc_id, {_duck_simhash('toks')} AS simhash
      FROM (SELECT doc_id, list_distinct({_DUCK_TOKENS}) AS toks FROM documents)
    ),
    halves AS (
      SELECT doc_id, simhash, half_id,
             CASE WHEN half_id = 0 THEN simhash & 65535
                  ELSE (simhash >> 16) & 65535 END AS half_key
      FROM sh, (SELECT unnest([0, 1]) AS half_id)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             a.simhash AS sh_a, b.simhash AS sh_b
      FROM halves a JOIN halves b
        ON a.half_id = b.half_id AND a.half_key = b.half_key
       AND a.doc_id < b.doc_id
    )
    SELECT a_id, b_id, bit_count(xor(sh_a, sh_b)) AS hamming
    FROM pairs
    WHERE bit_count(xor(sh_a, sh_b)) <= 6
    ORDER BY a_id, b_id
    """,
)
def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", _simhash(F.array_distinct(_tokens(F.col("text")))).alias("simhash")
    )
    halves = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("half_id"),
                    F.col("simhash").bitwiseAND(F.lit(65535)).alias("half_key"),
                ),
                F.struct(
                    F.lit(1).alias("half_id"),
                    F.shiftright(F.col("simhash"), 16)
                    .bitwiseAND(F.lit(65535))
                    .alias("half_key"),
                ),
            )
        ).alias("h"),
    ).select("doc_id", "simhash", "h.half_id", "h.half_key")
    pairs = (
        halves.alias("a")
        .join(
            halves.alias("b"),
            (F.col("a.half_id") == F.col("b.half_id"))
            & (F.col("a.half_key") == F.col("b.half_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.select("a_id", "b_id", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 6)
        .orderBy("a_id", "b_id")
    )


# --------------------------------------------------------------------------
# B25 — exact n-gram (bigram) Jaccard over blocked candidate pairs.
# Blocking key = (lang, n_chars ÷ 100) so the pair space stays linear-ish;
# Jaccard = |∩| / |∪| over distinct bigram shingle sets, exact integer
# counts divided once at the end (bit-identical across engines).
# --------------------------------------------------------------------------
@_register(
    "ngram_jaccard_pairs",
    f"""
    WITH grams AS (
      SELECT doc_id, lang, n_chars // 100 AS len_band,
             list_distinct(CASE WHEN len(toks) >= 2 THEN
               list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
               ELSE toks END) AS grams
      FROM (SELECT doc_id, lang, n_chars, {_DUCK_TOKENS} AS toks FROM documents)
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           len(list_intersect(a.grams, b.grams)) AS i_cnt,
           len(list_distinct(list_concat(a.grams, b.grams))) AS u_cnt,
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
    FROM grams a JOIN grams b
      ON a.lang = b.lang AND a.len_band = b.len_band AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
            / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.05
    ORDER BY a_id, b_id
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    bigrams = F.array_distinct(
        F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 2),
                lambda i: F.concat_ws(" ", toks[i], toks[i + 1]),
            ),
        ).otherwise(toks)
    )
    grams = docs.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / F.lit(100)).cast("bigint").alias("len_band"),
        bigrams.alias("grams"),
    )
    a, b = grams.alias("a"), grams.alias("b")
    i_cnt = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    u_cnt = F.size(F.array_distinct(F.concat(F.col("a.grams"), F.col("b.grams"))))
    jac = i_cnt.cast("double") / u_cnt
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_band") == F.col("b.len_band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            i_cnt.alias("i_cnt"),
            u_cnt.alias("u_cnt"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.05)
        .orderBy("a_id", "b_id")
    )
