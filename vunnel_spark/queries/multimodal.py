"""Multimodal-column queries (LLM-pipeline surface): binary payloads +
typed metadata through Arrow-batched mapInPandas stages.

The codec is a deterministic fake (this container has no image libs — see
operators/multimodal.py); the Spark plumbing (binary columns, schemas,
batch flow, composition) is real, so these are rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vunnel_spark.queries._util import t
from vunnel_spark.registry import register


@register(
    "m1_image_feature_extract",
    None,  # decode is the deterministic fake codec — not SQL-portable
    doc="Image feature extraction over a binary media column via "
        "mapInPandas (operators/multimodal.py image_features): per-image "
        "channel stats aggregated per width bucket",
    tags=("multimodal", "udf"),
)
def m1(spark, sf_dir):
    from vunnel_spark.operators.multimodal import image_features, synthesize_media_table

    media = synthesize_media_table(t(spark, sf_dir, "documents"))
    feats = image_features(media, fake=True)
    return (
        feats.groupBy("width")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.round(F.avg("mean_r"), 2).alias("avg_mean_r"),
            F.round(F.avg("std_all"), 2).alias("avg_std"),
        )
    )


@register(
    "m2_resize_pipeline",
    None,  # composed mapInPandas stages on fake-decoded payloads
    doc="Resize stage composition (operators/multimodal.py resize_images): "
        "media -> 8x8 resize -> feature extract — two chained Arrow stages, "
        "payloads never leave the executors",
    tags=("multimodal", "udf"),
)
def m2(spark, sf_dir):
    from vunnel_spark.operators.multimodal import (
        image_features,
        resize_images,
        synthesize_media_table,
    )

    media = synthesize_media_table(t(spark, sf_dir, "documents"))
    small = resize_images(media, out_w=8, out_h=8, fake=True)
    return image_features(small, fake=True).select(
        "media_id", "width", "height", F.round("std_all", 2).alias("std_all")
    )
