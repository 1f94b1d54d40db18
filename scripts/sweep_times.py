#!/usr/bin/env python
"""One-shot timing sweep over the whole registry at one SF dir.

Usage: python scripts/sweep_times.py [sf_dir] [out_json] [skip_csv]
Single measured run per query (after a shared table warm-up) — this
ranks queries for the scale-curve, it is not the benchmark.  skip_csv
names queries to exclude (e.g. the four audited fixed-granularity ANN
gates when sweeping sf1 — their scale story lives in
`scalecurve.py --scaled-ann`, and at 10x data they run for many
minutes by design).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()

    from vunnel_spark.registry import all_queries
    from vunnel_spark.session import get_spark, load_tables

    spark = get_spark("sweep_times")
    for df in load_tables(spark, sf_dir).values():
        df.count()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scalecurve import consume  # noop-sink action; see its docstring

    times = {}
    for name, fn in all_queries().items():
        if name in skip:
            continue
        t0 = time.monotonic()
        try:
            consume(fn(spark, sf_dir))
            times[name] = round(time.monotonic() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            times[name] = f"ERR {exc}"
        print(name, times[name], flush=True)
    ranked = sorted(
        ((v, k) for k, v in times.items() if isinstance(v, float)), reverse=True
    )
    print("\n-- top 20 --")
    for v, k in ranked[:20]:
        print(f"{v:8.3f}  {k}")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(times, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
