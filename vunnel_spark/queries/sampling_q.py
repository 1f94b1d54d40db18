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
