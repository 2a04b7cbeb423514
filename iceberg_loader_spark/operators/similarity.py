"""Similarity search over ``embeddings`` (SURVEY.md §2 B26).

Exact brute-force top-k cosine is the baseline; the LSH-bucketed variant is
the 100 TB path (candidates meet only inside hash buckets).

Float determinism: embeddings are float32. A double dot-product's value
depends on accumulation order, which we cannot pin across engines. So the
ranking quantity is computed in **exact integer fixed-point**: each element
is scaled by 1e7 and rounded to a bigint (a deterministic function of the
identical stored floats in both engines); dot products and norms over those
ints are exact 64-bit sums (64 dims × (~2e6)² × 64 ≪ 2⁶³). Cosine is then
one IEEE expression over exact ints — bit-identical everywhere.
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

FP_SCALE = 10000000  # 1e7 fixed-point scale for float32 elements


def _fixed_point(col):
    """array<float> → array<bigint> exact fixed-point."""
    return F.transform(col, lambda x: F.round(x.cast("double") * FP_SCALE, 0).cast("bigint"))


def _dot(a, b):
    """Exact bigint dot product of two fixed-point arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


# DuckDB twin of the fixed-point recipe (embedding → BIGINT[] → exact dot).
_DUCK_FP = "list_transform(CAST({col} AS DOUBLE[]), x -> CAST(ROUND(x * 10000000, 0) AS BIGINT))"
_DUCK_DOT = "list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]))"


# --------------------------------------------------------------------------
# Exact brute-force top-5 cosine neighbors for 10 query vectors.
# Scale: the query side is tiny and broadcast; candidates stream past it
# map-side (no shuffle of the big side); per-query top-k via rank window on
# the small joined result.
# --------------------------------------------------------------------------
@_register(
    "knn_topk_cosine",
    f"""
    WITH fp AS (
      SELECT vec_id, label,
             {_DUCK_FP.format(col='embedding')} AS e
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id, label, e, {_DUCK_DOT.format(a='e', b='e')} AS nsq FROM fp
    ),
    pairs AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id, c.label AS n_label,
             CAST({_DUCK_DOT.format(a='q.e', b='c.e')} AS DOUBLE)
               / (SQRT(CAST(q.nsq AS DOUBLE)) * SQRT(CAST(c.nsq AS DOUBLE))) AS cosine
      FROM norms q JOIN norms c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 10
    )
    SELECT q_id, n_id, n_label, cosine, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rnk
      FROM pairs)
    WHERE rnk <= 5
    ORDER BY q_id, rnk
    """,
)
def knn_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    fp = emb.select(
        "vec_id", "label", _fixed_point(F.col("embedding")).alias("e")
    ).withColumn("nsq", _dot(F.col("e"), F.col("e")))
    queries = fp.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("q_e"), F.col("nsq").alias("q_nsq")
    )
    pairs = fp.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id")).select(
        "q_id",
        F.col("vec_id").alias("n_id"),
        F.col("label").alias("n_label"),
        (
            _dot(F.col("q_e"), F.col("e")).cast("double")
            / (F.sqrt(F.col("q_nsq").cast("double")) * F.sqrt(F.col("nsq").cast("double")))
        ).alias("cosine"),
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .orderBy("q_id", "rnk")
    )


# --------------------------------------------------------------------------
# Per-label embedding statistics (exact fixed-point norms).
# --------------------------------------------------------------------------
@_register(
    "embedding_stats_per_label",
    f"""
    WITH fp AS (
      SELECT vec_id, label,
             {_DUCK_FP.format(col='embedding')} AS e,
             len(embedding) AS dim
      FROM embeddings
    )
    SELECT label, COUNT(*) AS n_vecs, MIN(dim) AS min_dim, MAX(dim) AS max_dim,
           SUM({_DUCK_DOT.format(a='e', b='e')}) AS sum_nsq_fp
    FROM fp
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_stats_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    fp = emb.select(
        "vec_id",
        "label",
        _fixed_point(F.col("embedding")).alias("e"),
        F.size("embedding").cast("bigint").alias("dim"),
    )
    return (
        fp.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.min("dim").alias("min_dim"),
            F.max("dim").alias("max_dim"),
            F.sum(_dot(F.col("e"), F.col("e"))).alias("sum_nsq_fp"),
        )
        .orderBy("label")
    )
