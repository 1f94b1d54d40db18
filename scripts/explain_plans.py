#!/usr/bin/env python
"""Write .explain("formatted") for named registered queries.

Usage:
    python scripts/explain_plans.py OUTDIR SUFFIX q1 q2 ...

Writes OUTDIR/<query>_<SUFFIX>.txt for each query.  Runs from whatever
repo root sits on sys.path, so the same script generates "before" plans
from a historical worktree and "after" plans from HEAD.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from vunnel_spark.registry import all_queries
    from vunnel_spark.session import get_spark

    spark = get_spark("vunnel_spark_explain")
    qs = all_queries()
    for name in names:
        if name not in qs:
            print(f"SKIP (not registered): {name}")
            continue
        try:
            df = qs[name](spark, sf_dir)
            jvm = spark._jvm
            plan = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR constructing/explaining {name}: {e}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
