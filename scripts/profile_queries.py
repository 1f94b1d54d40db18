#!/usr/bin/env python
"""Time registered queries in isolation with the noop sink (guide §1.4).

Usage:
    python scripts/profile_queries.py [--runs N] [--json OUT] q1 q2 ...

Per query: one discarded construction+codegen warm-up, then N timed runs
(construction + noop write, cache cleared between runs), median reported.
The noop sink materializes every column of every row, so the timing is
the computation, not the sink or count()'s column pruning.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    out_path = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--json":
            out_path = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from vunnel_spark.registry import all_queries
    from vunnel_spark.session import get_spark

    spark = get_spark("vunnel_spark_profile")
    qs = all_queries()
    results = {}
    for name in names:
        if name not in qs:
            print(f"SKIP {name}")
            continue
        samples = []
        for r in range(runs + 1):
            spark.sparkContext.setJobDescription(f"profile:{name}:run{r}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            if r:
                samples.append(el)
            spark.catalog.clearCache()
        samples.sort()
        med = samples[len(samples) // 2]
        results[name] = {
            "median": round(med, 3),
            "samples": [round(s, 3) for s in samples],
        }
        print(f"{name}: median {med:.3f}s  samples {[round(s,3) for s in samples]}")
        spark.sparkContext.setJobDescription(None)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
