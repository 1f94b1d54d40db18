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


def streaming_dedup(
    df: DataFrame,
    key_cols: tuple = ("event_type", "user_id"),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exact dedup on an unbounded stream (d1's semantics, streaming form).

    ``dropDuplicatesWithinWatermark`` keeps only the watermark horizon's
    keys in the state store — the property that makes streaming dedup
    viable at 100 TB/day, where an unbounded ``dropDuplicates`` would
    accumulate every key ever seen.  On a batch frame it degrades to plain
    ``dropDuplicates`` (one definition, two run modes, like the windows
    above).
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return df.dropDuplicates(list(key_cols))
