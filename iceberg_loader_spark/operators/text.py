"""Text-analysis operators over ``documents`` (SURVEY.md §2 B27).

Language-ID, quality scoring, token counting, fingerprinting — the
text-side of an LLM training-data pipeline. Everything is built-in Spark
SQL functions (JVM codegen, no Python in the hot path); tokenization is a
plain single-space split so the DuckDB oracle can reproduce it exactly.

Scale: per-document scoring is embarrassingly parallel (map-only, no
shuffle). Token counting shuffles once on the token key; top-k per group
uses a rank window after a partial aggregate, so the shuffle carries
(token, count) pairs, not raw tokens.
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
# Per-document quality metrics (map-only).
# --------------------------------------------------------------------------
@_register(
    "text_quality_documents",
    """
    SELECT doc_id, lang, source,
           LENGTH(text) AS n_chars_calc,
           LEN(STRING_SPLIT(text, ' ')) AS n_words,
           LENGTH(text) - LENGTH(REPLACE(text, '.', '')) AS n_periods,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             / LEN(STRING_SPLIT(text, ' ')) AS avg_word_len,
           CASE WHEN LENGTH(text) >= 300 THEN 1 ELSE 0 END AS is_long
    FROM documents
    ORDER BY doc_id
    """,
)
def text_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " "))
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            F.length("text").alias("n_chars_calc"),
            n_words.alias("n_words"),
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit(".")))).alias(
                "n_periods"
            ),
            (
                F.length(F.replace(F.col("text"), F.lit(" "))).cast("double") / n_words
            ).alias("avg_word_len"),
            F.when(F.length("text") >= 300, F.lit(1)).otherwise(F.lit(0)).alias("is_long"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Corpus token counting: top-20 tokens per language.
# --------------------------------------------------------------------------
@_register(
    "token_top20_per_lang",
    """
    WITH toks AS (
      SELECT lang, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS token FROM documents
    ),
    counts AS (
      SELECT lang, token, COUNT(*) AS cnt FROM toks GROUP BY 1, 2
    )
    SELECT * FROM (
      SELECT lang, token, cnt,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rnk
      FROM counts)
    WHERE rnk <= 20 AND token <> ''
    ORDER BY lang, rnk
    """,
)
def token_top20_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    counts = tokens.groupBy("lang", "token").agg(F.count("*").alias("cnt"))
    w = W.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("token"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter((F.col("rnk") <= 20) & (F.col("token") != ""))
        .orderBy("lang", "rnk")
    )


# --------------------------------------------------------------------------
# Document fingerprint: stable content hash (md5 — identical in DuckDB) and
# a coarse simhash-style bucket from the first 8 hex chars.
# --------------------------------------------------------------------------
@_register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           MD5(text) AS fp,
           SUBSTRING(MD5(text), 1, 4) AS bucket,
           LENGTH(text) AS n_chars_calc
    FROM documents
    ORDER BY doc_id
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.md5("text").alias("fp"),
            F.substring(F.md5("text"), 1, 4).alias("bucket"),
            F.length("text").alias("n_chars_calc"),
        )
        .orderBy("doc_id")
    )
