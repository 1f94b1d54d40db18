#!/usr/bin/env python
"""Registry-wide sf0.1 timing sweep under the r14 fixture-partitioning
policy (1 warm-up + 1 measured run per query, noop consuming action).

Purpose: rank every registered query by wall-clock at sf0.1 so the next
optimization frontier is data-driven (the r9 sweep chose CURVE_EXTRA;
this refresh measures operators rather than file layout — under-parallel
no-shuffle queries are rebuilt with the load_table fanout knob exactly
like scripts/scalecurve.py).  A single sample ranks; it does not
adjudicate (the curve harness owns precise measurements).

Usage: python scripts/registry_sweep.py [out_json] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scalecurve import SHUFFLE_RE, consume  # noqa: E402


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "registry_sweep_r14.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from vunnel_spark.registry import all_queries
    from vunnel_spark.session import get_spark, load_tables

    spark = get_spark("registry-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    for df in load_tables(spark, sf_dir).values():
        df.count()
    cores = spark.sparkContext.defaultParallelism
    qs = all_queries()
    out: dict[str, dict] = {}
    for name in sorted(qs):
        try:
            probe = qs[name](spark, sf_dir)
            plan = probe._jdf.queryExecution().executedPlan().toString()
            fanout = (
                not SHUFFLE_RE.search(plan)
                and probe.rdd.getNumPartitions() < max(4, cores * 3 // 4)
            )
            if fanout:
                os.environ["VS_SCAN_MIN_PARTITIONS"] = str(cores)
            try:
                consume(qs[name](spark, sf_dir))  # warm-up
                t0 = time.monotonic()
                consume(qs[name](spark, sf_dir))
                dt = round(time.monotonic() - t0, 3)
            finally:
                os.environ.pop("VS_SCAN_MIN_PARTITIONS", None)
            out[name] = {"sec": dt, "fanout": fanout}
            print(f"{name}: {dt}{' [fanout]' if fanout else ''}", flush=True)
        except Exception as e:  # noqa: BLE001
            out[name] = {"err": f"{type(e).__name__}: {e}"}
            print(f"ERR {name}: {e}", flush=True)
    ranked = sorted(
        (n for n in out if "sec" in out[n]),
        key=lambda n: -out[n]["sec"],
    )
    out["_meta"] = {"sf_dir": sf_dir, "top20": ranked[:20]}
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print("\ntop20:", ranked[:20])


if __name__ == "__main__":
    main()
