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
