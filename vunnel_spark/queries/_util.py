"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vunnel_spark.session import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table (normalized for driver-data quirks)."""
    return load_table(spark, sf_dir, name)
