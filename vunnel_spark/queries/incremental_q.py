"""Incremental aggregate-maintenance query (SURVEY §2.10 family,
generalized): update a per-user events rollup from a delta batch without
rescanning history.  The oracle aggregates the FULL raw table — merge
algebra says state ⊎ delta must equal it exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vunnel_spark.operators.incremental import aggregate_state, merge_agg_state
from vunnel_spark.queries._util import t
from vunnel_spark.registry import register

_CUTOFF = "2024-01-21 00:00:00"


@register(
    "i7_incremental_agg_merge",
    f"""
    SELECT user_id, count(*) AS n_rows,
           round(sum(value), 4) AS sum_value, max(ts) AS max_ts
    FROM events GROUP BY user_id
    """,
    doc="Materialized-rollup maintenance (operators/incremental.py): the "
        "per-user state aggregated from history (ts < cutoff) merges with "
        "the delta batch's partials by the aggregates' own algebra — sum "
        "of counts/sums, max of maxs — one |keys|-row shuffle, zero "
        "history rescans.  The oracle aggregates the full raw table: "
        "state ⊎ delta must equal it exactly (sum rounded, float "
        "association differs across merge orders)",
    tags=("incremental",),
)
def i7(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    history = ev.filter(F.col("ts") < F.lit(_CUTOFF).cast("timestamp"))
    delta = ev.filter(F.col("ts") >= F.lit(_CUTOFF).cast("timestamp"))
    kw = dict(keys=["user_id"], sum_cols=("value",), max_cols=("ts",))
    state = aggregate_state(history, **kw)
    merged = merge_agg_state([state, aggregate_state(delta, **kw)], **kw)
    return merged.select(
        "user_id", "n_rows",
        F.round("sum_value", 4).alias("sum_value"),
        F.col("max_ts"),
    )
