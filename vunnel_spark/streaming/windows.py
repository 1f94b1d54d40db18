"""Watermarked event-time window transformations.

Each takes a (possibly streaming) DataFrame with an event-time column and
returns the windowed aggregate.  On a streaming input the watermark bounds
state: late rows beyond ``watermark`` are dropped (append mode) or merged
(update mode) — the Structured Streaming realization of the reference's
watermark-driven delta sync (provider.py:188-201).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    size: str = "1 hour",
    keys: tuple = ("event_type",),
    watermark: str | None = "2 hours",
) -> DataFrame:
    src = df.withWatermark(ts_col, watermark) if watermark and df.isStreaming else df
    return (
        src.groupBy(F.window(ts_col, size).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("wstart"), F.col("w.end").alias("wend"), *keys, "n", "total_value")
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    src = df.withWatermark(ts_col, watermark) if watermark and df.isStreaming else df
    return (
        src.groupBy(F.window(ts_col, size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), F.col("w.end").alias("wend"), "n")
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    keys: tuple = ("user_id",),
    watermark: str | None = "2 hours",
) -> DataFrame:
    src = df.withWatermark(ts_col, watermark) if watermark and df.isStreaming else df
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *keys,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
