#!/usr/bin/env python
"""Benchmark harness: run headline queries at $SPARK_GRAFT_SF_DIR and print
one JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = the flagship TPC-H-shaped plans plus one representative per
heavy operator family (dedup, similarity, events windowing) when present.
Each query is fully materialized via a count-collecting action so the
measured time includes the whole plan, not just planning.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline queries, run in this order if registered
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_revenue_forecast",
    "tpch_q10_returned_items",
    "tpch_q12_shipmode_classes",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_pushdown",
    "d1_exact_dedup",
    "d3_minhash_lsh_pairs",
    "n1_ann_bruteforce_topk",
    "v1_tumbling_window_counts",
    "x1_token_count_stats",
]


def main() -> None:
    from vunnel_spark.registry import all_queries
    from vunnel_spark.session import get_spark

    spark = get_spark("vunnel_spark_bench")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs] or sorted(qs)[:5]

    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None

    # untimed warm-up: spin up executor threads, codegen, and the parquet
    # footer cache so the first timed query reflects steady state rather
    # than JVM startup (q1 previously absorbed ~1.5s of warm-up)
    from vunnel_spark.session import load_tables

    for df in load_tables(spark, SF_DIR).values():
        df.count()

    # Machine-drift calibration (r10 verdict #2): byte-identical headline
    # code measured 8.955 s -> 10.638 s across rounds purely on host speed,
    # so the headline alone can't distinguish a real regression from a slow
    # box.  Two fixed controls, medians of 3, run on the warmed session:
    # - jvm_hash: spark.range(4e9) -> bit_xor(xxhash64) — data-free, pure
    #   JVM compute through whole-stage codegen; tracks CPU speed x threads.
    # - scan_agg: full lineitem scan + one sum/count — tracks the parquet
    #   scan + decode path (IO side) at the bench SF.
    # Neither touches the headline plans; `normalized` = headline total /
    # jvm_hash is the round-over-round comparable (BASELINE.md §3).
    from pyspark.sql import functions as F

    def _median3(fn) -> float:
        # same protocol as the headline: one discarded codegen warm-up,
        # then median of three (the first 1e9-row run pays ~3 s of Janino)
        runs = []
        for i in range(4):
            t0 = time.perf_counter()
            fn()
            if i:
                runs.append(time.perf_counter() - t0)
        return round(sorted(runs)[1], 3)

    li_path = os.path.join(SF_DIR, "lineitem.parquet")
    calibration = {
        "jvm_hash_sec": _median3(
            lambda: spark.range(4_000_000_000)
            .select(F.bit_xor(F.xxhash64("id")).alias("h"))  # xor: no ANSI overflow
            .collect()
        ),
        "scan_agg_sec": _median3(
            lambda: spark.read.parquet(li_path)
            .agg(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                F.count("*"),
            )
            .collect()
        ),
    }

    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in names:
        # One discarded warm-up run pays the one-time whole-stage-codegen
        # compilation (Janino) for this plan shape — at real scale that
        # amortizes to nothing over hours of execution — then THREE
        # measured runs with the MEDIAN reported: on a shared host
        # individual sub-second queries moved ±35% between rounds, so a
        # single sample (or min-of-2) made round-over-round deltas noise.
        # Persisted intermediates do NOT carry over (each run constructs a
        # fresh plan with fresh persist handles), so every run re-executes
        # the full pipeline.  The timer covers construction AND the
        # action: operators that eagerly persist intermediate frames
        # (d3's candidate cache) do real work at construction time, which
        # a count()-only timer would hide.
        samples: list[float] = []
        for run in range(4):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.count()  # full materialization of the plan
            elapsed = time.perf_counter() - t0
            if run:  # run 0 = codegen warm-up, discarded
                samples.append(elapsed)
            # Drop any intermediates the query persisted (d3's candidate
            # cache).  Between runs: an identical plan maps to the same
            # CacheManager entry, so later runs would silently re-read
            # cached blocks ("Asked to cache already cached data" in the
            # round-3 artifact) and under-report the true pipeline cost.
            # Between queries: cached blocks pin executor storage memory
            # and skew every later measurement.  Each run starts cold;
            # only codegen/JIT warmth carries, which is what the warm-up
            # run is for.
            spark.catalog.clearCache()
        samples.sort()
        times[name] = round(samples[len(samples) // 2], 3)
        spread[name] = [round(samples[0], 3), round(samples[-1], 3)]

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "spread": spread,
                "calibration": calibration,
                "normalized": round(total / calibration["jvm_hash_sec"], 3),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
