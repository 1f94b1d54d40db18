#!/usr/bin/env python
"""Registry-wide single-partition audit (VERDICT r13 Next #4).

The driver fixtures are one parquet file with ONE row group per table,
so every scan collapses to one input partition at any gate SF.  A query
whose plan has no SHUFFLE exchange (broadcast exchanges don't
redistribute the probe side) therefore runs its whole per-row pipeline
on one core at local[32]: wall-clock measurements of such queries
reflect the file layout, not the operator (judge-measured on rhel2:
50-55 s serialized vs 11-24 s over 32-way input, identical plan).

For each registered query at a given SF dir this script records:

* ``shuffle_exchanges`` / ``broadcast_exchanges`` — counts from the
  executed plan (AQE initial; a shuffle anywhere re-spreads work, so
  only the pre-first-shuffle stages stay serialized),
* ``out_partitions`` — the planned output partitioning,
* ``single_stream`` — no shuffle exchange AND <=2 output partitions:
  the measurement-policy flag.  scripts/scalecurve.py rebuilds flagged
  queries with VS_SCAN_MIN_PARTITIONS=32 (vunnel_spark/session.py) so
  scale ratios measure the operator.  Registered plans themselves stay
  exchange-free: at production scale the scan has thousands of splits
  and a baked-in repartition would be a pure-overhead shuffle.

Usage: python scripts/audit_partitions.py [out_json] [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHUFFLE_RE = re.compile(
    r"Exchange (hashpartitioning|rangepartitioning|SinglePartition|"
    r"RoundRobinPartitioning)"
)


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "partition_audit_r14.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from vunnel_spark.registry import all_queries
    from vunnel_spark.session import get_spark

    spark = get_spark("partition-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    report: dict[str, dict] = {}
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            nparts = df.rdd.getNumPartitions()
        except Exception as e:  # noqa: BLE001
            report[name] = {"err": f"{type(e).__name__}: {e}"}
            print(f"ERR   {name}: {e}", flush=True)
            continue
        shuffles = len(SHUFFLE_RE.findall(plan))
        bcasts = plan.count("BroadcastExchange")
        single = shuffles == 0 and nparts <= 2
        report[name] = {
            "shuffle_exchanges": shuffles,
            "broadcast_exchanges": bcasts,
            "out_partitions": nparts,
            "single_stream": single,
        }
        if single:
            print(f"1-STREAM {name}: parts={nparts} bcast={bcasts}", flush=True)
    flagged = sorted(n for n, r in report.items() if r.get("single_stream"))
    report["_meta"] = {
        "sf_dir": sf_dir,
        "single_stream": flagged,
        "policy": (
            "scalecurve rebuilds single_stream queries with "
            "VS_SCAN_MIN_PARTITIONS=32; registered plans stay "
            "exchange-free (see module docstring)"
        ),
    }
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\n{len(flagged)} single-stream queries: {flagged}")


if __name__ == "__main__":
    main()
