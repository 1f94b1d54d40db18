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


@register(
    "i8_incremental_distinct_merge",
    """
    SELECT event_type, count(DISTINCT user_id) AS exact_users,
           1 AS within_tolerance
    FROM events GROUP BY event_type
    """,
    doc="Incremental DISTINCT-count maintenance via mergeable HLL "
        "sketches (operators/incremental.py distinct_state/"
        "merge_distinct_state): exact distinct is non-decomposable, so "
        "the rollup keeps ~4 KB register state per key and unions deltas "
        "by register-max — associative AND idempotent, so a replayed "
        "delta cannot double-count (the at-least-once-safe counterpart "
        "of i7).  Gate uses the a16 tolerance trick: Spark emits "
        "|merged-sketch estimate - exact| <= 5%*exact as "
        "within_tolerance, the oracle emits exact counts + literal 1",
    tags=("incremental", "agg"),
)
def i8(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    history = ev.filter(F.col("ts") < F.lit(_CUTOFF).cast("timestamp"))
    delta = ev.filter(F.col("ts") >= F.lit(_CUTOFF).cast("timestamp"))
    from vunnel_spark.operators.incremental import (
        distinct_state,
        estimate_distinct,
        merge_distinct_state,
    )

    keys = ["event_type"]
    state = distinct_state(history, keys, "user_id")
    merged = merge_distinct_state(
        [state, distinct_state(delta, keys, "user_id")], keys, "user_id"
    )
    est = estimate_distinct(merged, "user_id", "est")
    exact = ev.groupBy(*keys).agg(F.countDistinct("user_id").alias("exact_users"))
    return (
        est.join(exact, keys)
        .select(
            "event_type", "exact_users",
            (F.abs(F.col("est") - F.col("exact_users"))
             <= 0.05 * F.col("exact_users")).cast("int").alias("within_tolerance"),
        )
    )


@register(
    "i9_incremental_quantile_merge",
    """
    WITH b AS (
      SELECT event_type,
             LEAST(GREATEST(CAST(floor(value / 10.0) AS BIGINT), 0), 59) AS bin
      FROM events WHERE value IS NOT NULL
    ), c AS (
      SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, bin,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS total
      FROM c
    )
    SELECT event_type,
           CAST(min(CASE WHEN 100 * cum >= 50 * total THEN bin END) * 10.0
                AS DOUBLE) AS p50,
           CAST(min(CASE WHEN 100 * cum >= 95 * total THEN bin END) * 10.0
                AS DOUBLE) AS p95,
           CAST(min(CASE WHEN 100 * cum >= 99 * total THEN bin END) * 10.0
                AS DOUBLE) AS p99
    FROM cum GROUP BY event_type
    """,
    doc="Incremental QUANTILE maintenance via mergeable fixed-bin "
        "histogram state (operators/incremental.py histogram_state/"
        "merge_histogram_state/estimate_quantiles): percentiles are "
        "non-decomposable, but bin counts add exactly — history state + "
        "delta state merges to the bit-identical histogram of the full "
        "data, so unlike sketch quantiles this path verifies by EXACT "
        "value.  Estimator = lower edge of the first bin whose "
        "cumulative reaches p% (integer threshold arithmetic, no "
        "interpolation ambiguity); state = one 60-long array per key "
        "built by conditional sums in a single shuffle (no per-bin "
        "explode on the raw data)",
    tags=("incremental", "agg"),
)
def i9(spark, sf_dir):
    from vunnel_spark.operators.incremental import (
        estimate_quantiles,
        histogram_state,
        merge_histogram_state,
    )

    ev = t(spark, sf_dir, "events")
    history = ev.filter(F.col("ts") < F.lit(_CUTOFF).cast("timestamp"))
    delta = ev.filter(F.col("ts") >= F.lit(_CUTOFF).cast("timestamp"))
    keys, lo, hi, nb = ["event_type"], 0.0, 600.0, 60
    state = histogram_state(history, keys, "value", lo, hi, nb)
    merged = merge_histogram_state(
        [state, histogram_state(delta, keys, "value", lo, hi, nb)], keys
    )
    return estimate_quantiles(merged, keys, lo, hi, (50, 95, 99))
