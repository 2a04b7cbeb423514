"""UDF surface (SURVEY.md §2 B24): vectorized pandas UDFs with SQL twins.

Policy: UDFs are the slow path — every operator that CAN be a built-in
expression IS one elsewhere in this package. This module demonstrates the
sanctioned escape hatch for logic that genuinely needs Python: Arrow-batch
``pandas_udf`` (scalar) and ``applyInPandas`` (grouped), each paired with
an exactly-equivalent SQL oracle so correctness of the UDF path itself is
oracle-gated like everything else.

Scale: scalar pandas UDFs stream Arrow batches through one Python worker
per core with no shuffle; the grouped variant shuffles once on the group
key. Never row-at-a-time ``F.udf`` in a hot path (10-100× slower).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

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


@pandas_udf(DoubleType())
def _readability_score(text: pd.Series) -> pd.Series:
    """chars-per-word score, computed vectorized on Arrow batches."""
    n_chars = text.str.len().astype("float64")
    n_words = text.str.split(" ").str.len().clip(lower=1).astype("float64")
    return n_chars / n_words


# --------------------------------------------------------------------------
# B24 — scalar pandas UDF with an exact SQL twin. (The twin is the point:
# a UDF whose semantics can't be restated in SQL can't be oracle-checked.)
# --------------------------------------------------------------------------
@_register(
    "pandas_udf_readability",
    """
    SELECT doc_id,
           CAST(LENGTH(text) AS DOUBLE)
             / GREATEST(LEN(STRING_SPLIT(text, ' ')), 1) AS score,
           lang
    FROM documents
    ORDER BY doc_id
    """,
)
def pandas_udf_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", _readability_score("text").alias("score"), "lang")
        .orderBy("doc_id")
    )


_LANG_STATS_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("n_docs", LongType()),
        StructField("mean_chars", DoubleType()),
        StructField("max_chars", LongType()),
    ]
)


def _lang_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    n = pdf["n_chars"]
    return pd.DataFrame(
        {
            "lang": [pdf["lang"].iloc[0]],
            "n_docs": [len(pdf)],
            # exact integer sum / count — same IEEE division as the oracle
            "mean_chars": [float(int(n.sum())) / len(pdf)],
            "max_chars": [int(n.max())],
        }
    )


# --------------------------------------------------------------------------
# B24 — grouped applyInPandas: whole-group pandas computation per language
# (one shuffle on the group key, Arrow both ways).
# --------------------------------------------------------------------------
@_register(
    "apply_in_pandas_lang_stats",
    """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def apply_in_pandas_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", "n_chars")
        .groupBy("lang")
        .applyInPandas(_lang_stats, schema=_LANG_STATS_SCHEMA)
        .orderBy("lang")
    )


def _arrow_token_count(batches):
    """RecordBatch-level token counting: pure pyarrow.compute kernels, no
    pandas conversion at all — the lowest-overhead Python escape hatch
    (single-spaced corpus: tokens = spaces + 1, mirrored in the oracle)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for b in batches:
        text = b.column("text")
        n_tokens = pc.add(pc.count_substring(text, " "), 1)
        yield pa.RecordBatch.from_arrays(
            [
                b.column("doc_id"),
                n_tokens.cast(pa.int64()),
                pc.utf8_length(text).cast(pa.int64()),
            ],
            ["doc_id", "n_tokens", "n_chars_utf8"],
        )


# --------------------------------------------------------------------------
# B24 — mapInArrow: the third UDF entry point (scalar pandas_udf and
# grouped applyInPandas above). Arrow RecordBatches in and out with zero
# pandas materialization — the shape a high-throughput tokenizer bridge
# (e.g. a Rust BPE via its Arrow FFI) plugs into.
# --------------------------------------------------------------------------
@_register(
    "map_in_arrow_token_count",
    """
    SELECT doc_id,
           CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT)
             AS n_tokens,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_utf8
    FROM documents
    ORDER BY doc_id
    """,
)
def map_in_arrow_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "text")
        .mapInArrow(
            _arrow_token_count,
            schema="doc_id long, n_tokens long, n_chars_utf8 long",
        )
        .orderBy("doc_id")
    )


@pandas_udf(LongType())
def _midrange_cents(cents: pd.Series) -> int:
    """GROUPED_AGG pandas UDF: midrange (max+min) div 2 — integer math
    on the already-exact cents so the SQL twin matches bit-for-bit."""
    return int((int(cents.max()) + int(cents.min())) // 2)


@pandas_udf(LongType())
def _count_rows(cents: pd.Series) -> int:
    # Spark refuses to mix GROUPED_AGG pandas UDFs with built-in
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the row
    # count rides as a second pandas aggregate.
    return int(len(cents))


# --------------------------------------------------------------------------
# B24 — GROUPED_AGG pandas UDF (the third UDF mode: scalar and grouped-
# map are covered above; this is the user-defined *aggregate* path,
# usable in groupBy().agg and over windows). The aggregate itself stays
# integer-exact so the oracle twin reproduces it.
#
# Scale: AggregateInPandas shuffles once on the group key and streams
# each group's column through Arrow — same shuffle shape as a built-in
# aggregate, minus partial map-side combine (the documented cost of
# custom UDAFs; keep them off the hottest paths).
# --------------------------------------------------------------------------
@_register(
    "pandas_udaf_value_midrange",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST((MAX(CAST(ROUND(value * 100, 0) AS BIGINT))
                 + MIN(CAST(ROUND(value * 100, 0) AS BIGINT))) // 2
                AS BIGINT) AS midrange_cents
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def pandas_udaf_value_midrange(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    return (
        ev.select("event_type", cents.alias("cents"))
        .groupBy("event_type")
        .agg(
            _count_rows("cents").alias("n_events"),
            _midrange_cents("cents").alias("midrange_cents"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# B24 — Python UDTF (Spark 4's fourth UDF mode: a user-defined TABLE
# function — one input row fans out to N output rows, used via LATERAL
# join in SQL). Splits each document into segments on the literal
# ' the ' separator (the corpus is synthetic word-soup with no
# punctuation, so a frequent stopword is the deterministic segment
# boundary) and emits (sent_idx, n_words) per segment; the oracle
# replays the same split with DuckDB list functions. The semantics
# (non-regex split, whitespace word count) are pinned to be engine-
# reproducible.
#
# Scale: a UDTF evaluates per input row in the Python worker — the
# per-row cost is the documented price of the fan-out escape hatch, so
# it belongs on bounded/mid-size inputs; an explode(split()) built-in
# spelling (used by the token queries elsewhere) is the hot-path form
# of the same shape. The lateral join itself stays a narrow map-side
# op: no shuffle, parallel per input partition.
# --------------------------------------------------------------------------
def _sentence_split_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, n_words int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, sent in enumerate(text.split(" the ")):
                n_words = sum(1 for w in sent.split(" ") if w)
                yield i, n_words

    return SentenceSplit


@_register(
    "udtf_sentence_stats",
    """
    WITH s AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(parts) + 1),
               i -> struct_pack(
                 idx := i - 1,
                 nw := len(list_filter(string_split(parts[i], ' '),
                                       w -> w <> ''))))) AS u
      FROM (SELECT doc_id, string_split(text, ' the ') AS parts
            FROM documents WHERE doc_id < 200)
    )
    SELECT doc_id, CAST(u.idx AS INTEGER) AS sent_idx,
           CAST(u.nw AS INTEGER) AS n_words
    FROM s
    ORDER BY doc_id, sent_idx
    """,
)
def udtf_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iceberg_loader_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    spark.udtf.register("sentence_split", _sentence_split_udtf())
    return spark.sql(
        """
        SELECT doc_id, s.sent_idx, s.n_words
        FROM documents, LATERAL sentence_split(text) s
        WHERE doc_id < 200
        ORDER BY doc_id, sent_idx
        """
    )


def _arrow_source_stats(key, tbl):
    """Whole-group pyarrow.Table in, one-row Table out — pure
    pyarrow.compute kernels, no pandas anywhere."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = tbl.num_rows
    chars = tbl.column("n_chars")
    return pa.table(
        {
            "source": pa.array([key[0].as_py()], pa.string()),
            "n_docs": pa.array([n], pa.int64()),
            "total_chars": pa.array(
                [pc.sum(chars).as_py() or 0], pa.int64()
            ),
            "max_chars": pa.array([pc.max(chars).as_py()], pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# B24 — applyInArrow: the grouped-map Arrow entry point (the Arrow-native
# sibling of applyInPandas): each group arrives as ONE pyarrow.Table and
# the transform runs pure pyarrow.compute — the shape a native-kernel
# feature library (Rust/C++ via Arrow FFI) plugs into without a pandas
# detour. Completes the Python-bridge surface alongside pandas_udf,
# applyInPandas, mapInArrow, the GROUPED_AGG UDAF and the UDTF.
#
# Scale: one shuffle on the group key; per-group state is that source's
# rows (bounded by the source-size distribution the skew diagnostics
# watch — same contract as applyInPandas).
# --------------------------------------------------------------------------
@_register(
    "apply_in_arrow_source_stats",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def apply_in_arrow_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", "n_chars")
        .groupBy("source")
        .applyInArrow(
            _arrow_source_stats,
            schema="source string, n_docs long, total_chars long, max_chars long",
        )
        .orderBy("source")
    )
