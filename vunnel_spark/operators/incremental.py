"""Incremental aggregate maintenance — merge a persisted aggregation
state with a delta batch instead of rescanning history.

The reference's incremental tier re-emits full results from a watermark
delta plus cached prior state (SURVEY §2.10 I1/I2; nvd/manager.py's
watermark sync).  Generalized to the analytics surface this is
materialized-view maintenance: for DECOMPOSABLE aggregates
(count/sum/min/max — mean derives as sum/count) the per-key final rows
ARE the mergeable partial state, so updating a 100 TB-history rollup
costs one scan of the delta plus a shuffle of |keys| state rows — never
a rescan of history.  Non-decomposable aggregates (exact distinct,
median) need sketch state instead (HLL for distinct — a16's
approx_count_distinct path); that trade is the textbook lambda-
architecture split and is deliberately out of scope here.

``aggregate_state`` produces the state shape from a raw frame;
``merge_agg_state`` folds any number of states/deltas together.  Both are
pure DataFrame plans: union of k-row frames -> ONE shuffle on the keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_state(
    df: DataFrame,
    keys: list[str],
    count_col: str = "n_rows",
    sum_cols: tuple[str, ...] = (),
    min_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Aggregate a raw frame into mergeable per-key state (the same
    column shape ``merge_agg_state`` consumes and produces)."""
    aggs = [F.count(F.lit(1)).alias(count_col)]
    aggs += [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    aggs += [F.min(c).alias(f"min_{c}") for c in min_cols]
    aggs += [F.max(c).alias(f"max_{c}") for c in max_cols]
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_state(
    states: list[DataFrame],
    keys: list[str],
    count_col: str = "n_rows",
    sum_cols: tuple[str, ...] = (),
    min_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fold state frames (prior state + one or more delta states) into the
    updated state.  Keys absent from one side pass through; keys present
    in several merge by the aggregate's own algebra (sum of counts/sums,
    min of mins, max of maxs) — so the result equals aggregating the
    concatenated raw inputs, which is what the oracle checks."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    aggs = [F.sum(count_col).alias(count_col)]
    aggs += [F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols]
    aggs += [F.min(f"min_{c}").alias(f"min_{c}") for c in min_cols]
    aggs += [F.max(f"max_{c}").alias(f"max_{c}") for c in max_cols]
    return merged.groupBy(*keys).agg(*aggs)


def distinct_state(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Mergeable per-key DISTINCT-count state: a Datasketches HLL sketch
    per key (``hll_<col>`` binary column).

    Exact distinct is the canonical NON-decomposable aggregate — final
    counts cannot merge (union sizes are not sums), so the
    ``merge_agg_state`` path cannot maintain it.  The sketch CAN: HLL
    register state unions by max, which is associative, commutative and
    IDEMPOTENT — a replayed delta batch cannot double-count, the
    property that makes the maintenance loop safe under at-least-once
    delivery (where a retried count/sum delta would corrupt i7-style
    state).  ~2^lg_k bytes per key, ~2% relative error at the default.
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(f"hll_{value_col}")
    )


def merge_distinct_state(
    states: list[DataFrame], keys: list[str], value_col: str
) -> DataFrame:
    """Union per-key sketches across state/delta frames: one |keys|-row
    shuffle of fixed-size binaries, zero history rescans."""
    col = f"hll_{value_col}"
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*keys).agg(F.hll_union_agg(col).alias(col))


def estimate_distinct(state: DataFrame, value_col: str, out_col: str | None = None) -> DataFrame:
    """Read the estimate off the sketch state."""
    col = f"hll_{value_col}"
    return state.withColumn(
        out_col or f"approx_distinct_{value_col}", F.hll_sketch_estimate(F.col(col))
    )
