"""Transactional-table-format adapter (Delta Lake) for the sink idioms.

The parquet stage+atomic-swap protocol in ``sinks/writers.py`` is
single-writer by construction: correct on one machine (and a faithful
analogue of the reference's flat-file store, result.py), but at 100 TB
with concurrent writers the merge/frozen-partition/first-observed paths
belong on a transactional table format where the SAME logical operations
are real commands:

  first_observed_merge      ->  MERGE INTO ... WHEN NOT MATCHED INSERT
  overwrite_partitions (I6) ->  INSERT OVERWRITE w/ replaceWhere
  dedup-on-write (A12)      ->  MERGE INTO ... WHEN MATCHED UPDATE

This module routes those operations through the public ``delta-spark``
API when the package + jars are on the session's classpath, and reports
unavailability cleanly otherwise — callers (writers.py) fall back to the
parquet swap, so the engine runs identically in bare-parquet
environments.  Only public Delta Lake APIs are used; an Iceberg adapter
would be the same three routines against ``spark.sql`` MERGE/INSERT
OVERWRITE on an Iceberg catalog table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delta_available(spark: SparkSession | None = None) -> bool:
    """True iff the delta-spark package is importable AND (when a session
    is given) its SQL extension can actually back a DeltaTable — the
    python package alone is not enough without the jars."""
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except Exception:
        return False
    if spark is None:
        return True
    try:
        # cheap classpath probe: the class resolves only with the jar
        spark._jvm.io.delta.tables.DeltaTable  # noqa: B018
        return True
    except Exception:
        return False


def should_use_delta(spark: SparkSession, path: str, table_format: str) -> bool:
    """Resolve the table_format knob against BOTH the classpath and the
    store that already exists at ``path``.

    'auto' must never reformat an existing store: a parquet-swap store
    created before delta-spark was installed (or by an explicit
    table_format='parquet' call) keeps using the parquet path even when
    delta becomes available — writing delta into a live parquet
    directory would fail (or orphan the prior state from delta reads).
    Format detection uses Delta's public on-disk marker (_delta_log/).
    """
    import os

    if table_format == "delta":
        return True
    if table_format != "auto":
        return False
    if not delta_available(spark):
        return False
    if os.path.exists(path):
        return os.path.isdir(os.path.join(path, "_delta_log"))
    return True  # fresh store: prefer the transactional format


def _require_delta(spark: SparkSession):
    if not delta_available(spark):
        raise RuntimeError(
            "table_format='delta' requested but delta-spark (package + "
            "jars) is not on this session's classpath; install "
            "delta-spark and build the session with "
            "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension, "
            "or use table_format='parquet' for the single-writer swap"
        )
    from delta.tables import DeltaTable

    return DeltaTable


def merge_first_observed_delta(
    spark: SparkSession,
    path: str,
    new_keys: DataFrame,
    key_cols: Sequence[str],
    date_col: str = "first_observed",
    today: str | None = None,
) -> DataFrame:
    """I4 first-observed state as a real MERGE INTO (insert-on-miss only —
    existing rows are never updated, so re-merging the same keys is
    idempotent, the same contract the parquet path keeps by anti-join).
    """
    DeltaTable = _require_delta(spark)
    today_col = F.lit(today).cast("date") if today else F.current_date()
    inserts = new_keys.distinct().withColumn(date_col, today_col)
    if not DeltaTable.isDeltaTable(spark, path):
        inserts.write.format("delta").save(path)
    else:
        cond = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
        (
            DeltaTable.forPath(spark, path)
            .alias("t")
            .merge(inserts.alias("s"), cond)
            .whenNotMatchedInsertAll()
            .execute()
        )
    return spark.read.format("delta").load(path)


def overwrite_partitions_delta(
    df: DataFrame,
    path: str,
    partition_col: str,
    partitions: Sequence[str] | None = None,
) -> None:
    """I6 frozen-fragment layering as a transactional partition replace:
    ``replaceWhere`` limits the overwrite to exactly today's partitions,
    committed atomically for the whole set (the parquet path is only
    per-directory atomic)."""
    spark = df.sparkSession
    _require_delta(spark)
    out = df
    if partitions is None:
        partitions = [
            r[0] for r in df.select(partition_col).distinct().collect()
        ]
    else:
        out = df.filter(F.col(partition_col).isin(list(partitions)))
    quoted = ", ".join("'" + str(p).replace("'", "''") + "'" for p in partitions)
    (
        out.write.format("delta")
        .mode("overwrite")
        .option("replaceWhere", f"{partition_col} IN ({quoted})")
        .partitionBy(partition_col)
        .save(path)
    )
