#!/usr/bin/env python
"""Audit: which registry queries did the sweep's old count() action
silently truncate?

count() lets Catalyst drop anything that can't change the row count —
pure projections, Window functions, and final Sorts all fold away
under Aggregate(count(1)).  For every registered query this builds the
optimized plan of the query itself (what a real consumer runs / what
the noop-sink action now times) and the optimized plan of
``df.groupBy().count()`` (what the old sweep action timed), and flags
queries whose Window/Sort nodes disappear under count.  Generate
(explode) and joins change row counts so they never prune — the flagged
set is exactly the window/sort tail.

Usage: python scripts/audit_sweep_action.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _nodes(plan: str, kind: str) -> int:
    # match plan-tree node heads only (e.g. '+- Window [' / 'Sort ['),
    # not substrings inside expression names
    return len(re.findall(rf"(?:^|[+:]- ){kind} ", plan, re.M))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "sweep_action_audit.json"
    )

    from vunnel_spark.registry import all_queries
    from vunnel_spark.session import get_spark

    spark = get_spark("sweep-audit")
    flagged: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name, fn in all_queries().items():
        try:
            df = fn(spark, sf_dir)
            full = df._jdf.queryExecution().optimizedPlan().toString()
            cnt = (
                df.groupBy()
                .count()
                ._jdf.queryExecution()
                .optimizedPlan()
                .toString()
            )
        except Exception as exc:  # noqa: BLE001
            errors[name] = str(exc).splitlines()[0][:200]
            continue
        lost = {
            kind: (_nodes(full, kind), _nodes(cnt, kind))
            for kind in ("Window", "Sort")
            if _nodes(full, kind) > _nodes(cnt, kind)
        }
        if lost:
            flagged[name] = {
                k: {"consumed_plan": a, "count_plan": b}
                for k, (a, b) in lost.items()
            }
            print(f"FLAG {name}: {flagged[name]}", flush=True)
    report = {
        "_method": (
            "optimized-plan diff at "
            + sf_dir
            + ": Window/Sort node counts under the consuming (noop-sink) "
            "action vs under the old count() action; flagged = nodes the "
            "count() sweep never executed"
        ),
        "flagged": flagged,
        "errors": errors,
        "n_registry": len(all_queries()),
        "n_flagged": len(flagged),
    }
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "flagged"},
                     indent=1))
    print(f"{len(flagged)} flagged -> {out_json}")


if __name__ == "__main__":
    main()
