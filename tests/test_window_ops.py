"""fill_down / fill_down_global semantics and scale-shape (W4).

The r8 verdict flagged fill_down's silent unpartitioned default as an
API footgun; it is now required-partitioned, with exact global fills
routed through the distributed two-level carry (fill_down_global).
"""

import random

import pytest
from pyspark.sql import functions as F

from vunnel_spark.operators.windows import fill_down, fill_down_global


def test_fill_down_requires_partition(spark):
    df = spark.createDataFrame([(1, "a")], "i int, v string")
    with pytest.raises(ValueError, match="partition_by"):
        fill_down(df, ["v"], ["i"], [])


def test_fill_down_partitioned_fills_within_key(spark):
    rows = [
        (1, 1, "h1"), (1, 2, None), (1, 3, None),
        (2, 1, None), (2, 2, "h2"), (2, 3, None),
    ]
    df = spark.createDataFrame(rows, "k int, i int, v string")
    got = {
        (r["k"], r["i"]): r["v"]
        for r in fill_down(df, ["v"], ["i"], ["k"]).collect()
    }
    assert got[(1, 2)] == "h1" and got[(1, 3)] == "h1"
    assert got[(2, 1)] is None  # nothing leaks across keys
    assert got[(2, 3)] == "h2"


def test_fill_down_global_matches_naive_global_window(spark):
    """Randomized equivalence vs the single-partition reference fill,
    including buckets that are entirely null for a column (the carry
    must cross MULTIPLE bucket boundaries) and a leading null run."""
    rng = random.Random(7)
    rows = []
    for i in range(500):
        a = f"A{i}" if rng.random() < 0.04 else None   # sparse: multi-bucket carries
        b = f"B{i}" if rng.random() < 0.30 else None
        rows.append((i, a, b))
    df = spark.createDataFrame(rows, "line_no long, a string, b string").repartition(8)

    # naive reference: pure-Python forward fill in line order
    expect, last_a, last_b = {}, None, None
    for i, a, b in rows:
        last_a, last_b = a or last_a, b or last_b
        expect[i] = (last_a, last_b)

    got = {
        r["line_no"]: (r["a"], r["b"])
        for r in fill_down_global(
            df, ["a", "b"], "line_no", bucket_size=64
        ).collect()
    }
    assert got == expect


def test_fill_down_global_keeps_null_ordered_rows(spark):
    """Rows whose order_col is NULL must survive (null-safe carry join)
    and behave like the naive window's nulls-first placement: they fill
    only from each other and seed the carry for every later bucket."""
    rows = [
        (None, "H0"),   # null-ordered, non-null value: seeds the carry
        (None, None),   # null-ordered, null value: fills from H0
        (5, None),      # first real bucket: inherits the null bucket's carry
        (150, "H1"),
        (260, None),
    ]
    df = spark.createDataFrame(rows, "line_no long, v string").repartition(4)
    out = fill_down_global(df, ["v"], "line_no", bucket_size=100).collect()
    assert len(out) == len(rows)  # nothing dropped
    got = {r["line_no"]: r["v"] for r in out}
    assert got[5] == "H0"      # carry crossed from the null bucket
    assert got[150] == "H1"
    assert got[260] == "H1"
    null_vals = [r["v"] for r in out if r["line_no"] is None]
    assert len(null_vals) == 2 and "H0" in null_vals
    # the null-value null-ordered row fills from H0 or stays None
    # depending on tie order (same nondeterminism as the naive window)
    assert set(null_vals) <= {"H0", None}


def test_fill_down_global_plan_no_fullframe_global_window(spark):
    """Every window spec that touches the data columns must partition by
    _fd_bucket; the only unpartitioned window is the per-bucket carry
    (#buckets rows), and the carry joins back via broadcast."""
    df = spark.range(1000).select(
        F.col("id").alias("line_no"),
        F.when(F.col("id") % 50 == 0, F.concat(F.lit("h"), F.col("id"))).alias("v"),
    )
    out = fill_down_global(df, ["v"], "line_no", bucket_size=100)
    p = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastHashJoin" in p, p
    specs = [ln for ln in p.splitlines() if "windowspecdefinition" in ln]
    assert specs, p
    for ln in specs:
        if " v#" in ln or "(v#" in ln:
            assert "_fd_bucket" in ln, ln
