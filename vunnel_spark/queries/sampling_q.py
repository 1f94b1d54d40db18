"""Dataset-split assignment (LLM-pipeline surface, extends the x-family
sampling queries registered in queries/text.py).

The train/val/test split of a web-scale corpus must be a pure function of
the document identity — never of row order, partitioning, or a stored
random draw — so any engine, any rerun, and any downstream consumer
derives the same membership (and a later re-crawl of the same doc lands
in the same split, keeping val forever uncontaminated by train).  Same
engine-portable md5-threshold discipline as x7/x12: ZERO shuffles, a
scan-pushed projection.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vunnel_spark.queries._util import NEAR_DUPS_SQL as _NEAR_DUPS_SQL
from vunnel_spark.queries._util import t
from vunnel_spark.registry import register

# 80/10/10 via the first two hex digits (0..255): <204 train, <230 val
_TRAIN_HEX = "cc"  # 204/256 = 79.7%
_VAL_HEX = "e6"    # 230/256 = 89.8%


@register(
    "x14_dataset_split",
    f"""
    WITH h AS (
      SELECT doc_id, lang,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hh
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN hh < '{_TRAIN_HEX}' THEN 'train'
                WHEN hh < '{_VAL_HEX}' THEN 'val'
                ELSE 'test' END AS split
    FROM h
    """,
    doc="Deterministic 80/10/10 train/val/test split: membership is a "
        "pure function of the doc id (md5 first byte vs hex thresholds), "
        "so it is stable across engines, reruns, partitionings, and "
        "re-crawls — the property that keeps eval sets uncontaminated.  "
        "ZERO shuffles: a scan-pushed projection, the x7 sampling shape",
    tags=("text", "sampling"),
)
def x14(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    hh = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return docs.select(
        "doc_id", "lang",
        F.when(hh < _TRAIN_HEX, F.lit("train"))
        .when(hh < _VAL_HEX, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


@register(
    "x26_split_contamination",
    f"""
    WITH corpus AS ({_NEAR_DUPS_SQL}),
    words AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM corpus
    ), shingles AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
      FROM words, LATERAL (SELECT unnest(generate_series(1, len(w) - 2)) AS i) g
      WHERE len(w) >= 3
      UNION
      SELECT DISTINCT doc_id, array_to_string(w, ' ') FROM words WHERE len(w) < 3
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY id_a, id_b
    ), pairs AS (
      SELECT id_a, id_b
      FROM common
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.8
    ), s AS (
      SELECT doc_id,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                       < '{_TRAIN_HEX}' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                       < '{_VAL_HEX}' THEN 'val'
                  ELSE 'test' END AS split
      FROM corpus
    ), cls AS (
      SELECT least(sa.split, sb.split) AS split_lo,
             greatest(sa.split, sb.split) AS split_hi
      FROM pairs
      JOIN s sa ON sa.doc_id = id_a
      JOIN s sb ON sb.doc_id = id_b
    )
    SELECT split_lo, split_hi, CAST(count(*) AS BIGINT) AS n_pairs,
           split_lo <> split_hi AS is_leak
    FROM cls GROUP BY 1, 2
    """,
    doc="Cross-split contamination audit — the leakage check every "
        "train/eval split needs: exact near-dup pairs (d4's word-3-gram "
        "Jaccard >= 0.8 over the synthetic-dup corpus) classified by "
        "which x14 splits the two sides land in; any pair whose sides "
        "differ is leakage (a test doc with a train near-twin).  The "
        "synthetic duplicates get NEW ids and therefore independent "
        "split draws, so cross-split pairs provably exist.  Composition "
        "of two gate-proved stages (d4 pairs, x14 membership) — a "
        "mismatch isolates the wiring.  Scale: inherits d4's bucketed "
        "shingle equi-join (no all-pairs); split assignment is a "
        "scan-fused projection; the rollup output is at most 6 rows",
    tags=("text", "sampling", "dedup"),
)
def x26(spark, sf_dir):
    from vunnel_spark.operators.dedup import ngram_jaccard_pairs
    from vunnel_spark.queries._util import with_near_dups

    docs = with_near_dups(
        t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    pairs = ngram_jaccard_pairs(docs, threshold=0.8).select("id_a", "id_b")
    hh = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    s = docs.select(
        "doc_id",
        F.when(hh < _TRAIN_HEX, F.lit("train"))
        .when(hh < _VAL_HEX, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    j = (
        pairs.join(
            s.select(F.col("doc_id").alias("id_a"),
                     F.col("split").alias("split_a")), "id_a")
        .join(
            s.select(F.col("doc_id").alias("id_b"),
                     F.col("split").alias("split_b")), "id_b")
    )
    return (
        j.select(
            F.least("split_a", "split_b").alias("split_lo"),
            F.greatest("split_a", "split_b").alias("split_hi"),
        )
        .groupBy("split_lo", "split_hi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .withColumn("is_leak", F.col("split_lo") != F.col("split_hi"))
    )
