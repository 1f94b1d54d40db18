"""Text-analysis queries over the ``documents`` table (LLM-pipeline
surface): token counting, quality scoring, fingerprinting, language-ID.
All JVM expressions except language-ID's single Arrow-batched UDF.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vunnel_spark.functions.text import (
    avg_token_len,
    bpe_ish_token_count,
    detect_language,
    fingerprint,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)
from vunnel_spark.queries._util import t
from vunnel_spark.registry import register


@register(
    "x1_token_count_stats",
    """
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
           CAST(min(len(regexp_split_to_array(trim(text), '\\s+'))) AS INT) AS min_tokens,
           CAST(max(len(regexp_split_to_array(trim(text), '\\s+'))) AS INT) AS max_tokens
    FROM documents
    GROUP BY lang
    """,
    doc="Whitespace token counts per language (functions/text.py "
        "token_count): JVM split, no UDF",
    tags=("text",),
)
def x1(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return (
        docs.withColumn("ntok", token_count(F.col("text")))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("total_tokens"),
            F.min("ntok").cast("int").alias("min_tokens"),
            F.max("ntok").cast("int").alias("max_tokens"),
        )
    )


@register(
    "x2_quality_signals",
    """
    WITH base AS (
      SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
    )
    SELECT doc_id,
           len(w) AS n_tokens,
           round(CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                 / length(text), 6) AS punct_ratio,
           round(CAST(len(list_filter(w, x -> list_contains(
                   ['the','a','of','and','to','in','is','it'], lower(x)))) AS DOUBLE)
                 / len(w), 6) AS stopword_ratio,
           round(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w), 6)
             AS avg_token_len
    FROM base
    """,
    doc="Per-document quality signals (functions/text.py): punct ratio, "
        "stopword occurrence ratio, average token length — C4/Gopher-style "
        "filter inputs, all codegen expressions",
    tags=("text",),
)
def x2(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(stopword_ratio(F.col("text")), 6).alias("stopword_ratio"),
        F.round(avg_token_len(F.col("text")), 6).alias("avg_token_len"),
    )


@register(
    "x3_quality_filter",
    None,  # composite score weights are engine-defined; components checked in x2
    doc="Composite quality score + keep/drop filter (functions/text.py "
        "quality_score): the pipeline gate built from x2's signals; also "
        "exercises bpe-ish token estimation",
    tags=("text",),
)
def x3(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        quality_score(F.col("text")).alias("quality"),
        bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
    ).filter(F.col("quality") >= 0.3)


@register(
    "x4_document_fingerprints",
    """
    WITH words AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
    )
    SELECT doc_id,
           sum((ascii(w[i][1]) * 256 + len(w[i])) * CAST(i AS BIGINT)) % 2147483647
             AS fingerprint
    FROM words, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) g
    GROUP BY doc_id
    """,
    doc="Order-sensitive rolling-hash document fingerprint "
        "(functions/text.py fingerprint) — SQL-expressible by design so the "
        "oracle verifies the exact arithmetic",
    tags=("text",),
)
def x4(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))


@register(
    "x5_language_id",
    None,  # n-gram heuristic scoring — UDF, not SQL-portable
    doc="Language-ID via character-bigram profiles (functions/text.py "
        "detect_language): one Arrow-batched pandas UDF; compared against "
        "the corpus lang labels as an accuracy side-output",
    tags=("text", "udf"),
)
def x5(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return (
        docs.withColumn("detected", detect_language(F.col("text")))
        .groupBy("lang", "detected")
        .agg(F.count(F.lit(1)).alias("n"))
    )
