#!/usr/bin/env python
"""Scale-curve measurement: time a query list across SF directories.

Usage: python scripts/scalecurve.py [out_json]

Runs the bench HEADLINE plus the most expensive non-headline registry
queries (CURVE_EXTRA, ranked by a prior sf0.1 sweep) at sf0.01 / sf0.1 /
sf1 (the key-shifted corpus from scripts/make_scale_data.py) and
reports per-query times and sf0.1->sf1 ratios.  One warm-up + two
measured runs per (query, sf); the MIN is reported — for a scaling
RATIO the floor is the right statistic (host-load spikes only ever
inflate).

Interpretation bar (VERDICT r8 #1): data grows 10x from sf0.1 to sf1,
so a healthy ratio is ~<=10-15x (linear work, sublinear constants with
fixed overheads amortizing); materially above that suggests a
superlinear stage and earns a plan audit.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIRS = {
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(REPO, ".scaledata", "sf1"),
}

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

# the most expensive non-headline registry queries by the r9 sf0.1
# sweep — overwritten by --extra if given
CURVE_EXTRA: list[str] = []


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "scalecurve_results.json"
    )
    extra = CURVE_EXTRA
    if len(sys.argv) > 2:
        extra = sys.argv[2].split(",")

    from vunnel_spark.registry import all_queries
    from vunnel_spark.session import get_spark, load_tables

    spark = get_spark("scalecurve")
    qs = all_queries()
    names = HEADLINE + [n for n in extra if n not in HEADLINE]
    names = [n for n in names if n in qs]

    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf_label, sf_dir in SF_DIRS.items():
        if not os.path.isdir(sf_dir) and not os.path.isdir(
            sf_dir.rstrip("/")
        ):
            print(f"skip {sf_label}: {sf_dir} missing", flush=True)
            continue
        for df in load_tables(spark, sf_dir).values():
            df.count()
        # 1 warm-up + 2 measured at the cheap SFs; at sf1 the heavy
        # queries run minutes, so 1 warm-up + 1 measured keeps the whole
        # curve under an hour — a single warm sample is plenty for a
        # 10x-ratio judgment
        n_runs = 2 if sf_label == "sf1" else 3
        for name in names:
            samples = []
            for run in range(n_runs):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                qs[name](spark, sf_dir).count()
                dt = time.monotonic() - t0
                if run:  # first run is codegen warm-up
                    samples.append(dt)
            results[name][sf_label] = round(min(samples), 3)
            print(f"{sf_label} {name}: {results[name][sf_label]}", flush=True)

    table = {}
    for name in names:
        r = results[name]
        ratio = (
            round(r["sf1"] / r["sf0.1"], 2)
            if r.get("sf1") and r.get("sf0.1")
            else None
        )
        table[name] = {**r, "ratio_01_to_1": ratio}
    with open(out_json, "w") as f:
        json.dump(table, f, indent=1)
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
