#!/usr/bin/env python
"""Report the max generated-method bytecode size per registered query.

Usage: python scripts/audit_codegen_size.py [sf_dir] [out_json]

The JVM JIT refuses to compile methods over 8000 bytecode bytes
(-XX:DontCompileHugeMethods, HugeMethodLimit=8000), so a WholeStageCodegen
stage whose generated ``processNext`` chain exceeds that runs in the
bytecode INTERPRETER — measured ~2x slower than per-operator codegen on
e17 at sf10 (guide §7.4 class of failure; OPTIMIZATION_r15.md).  Spark
only falls back to per-operator codegen above
``spark.sql.codegen.hugeMethodLimit`` (default 65535), leaving an
8000-65535 dead zone where code compiles but never JITs.

This audit compiles every registered query's final plan on the driver
(no execution) and reports the max method size across its
WholeStageCodegen subtrees, flagging the dead zone.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SIZE_RE = re.compile(r"maxMethodCodeSize:(\d+)")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None

    from vunnel_spark.registry import all_queries
    from vunnel_spark.session import get_spark

    spark = get_spark("audit_codegen_size")
    # AQE-wrapped plans hide their WSCG subtrees pre-execution; the
    # expression code this audit measures is AQE-independent
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    pkg = getattr(spark._jvm.org.apache.spark.sql.execution.debug, "package$")
    helper = getattr(pkg, "MODULE$")

    results = {}
    for name, fn in all_queries().items():
        try:
            df = fn(spark, sf_dir)
            cg = helper.codegenString(df._jdf.queryExecution().executedPlan())
            sizes = [int(m) for m in _SIZE_RE.findall(cg)]
            results[name] = {
                "n_wscg": len(sizes),
                "max_method_code_size": max(sizes) if sizes else 0,
            }
        except Exception as e:  # noqa: BLE001 - audit must not die on one query
            results[name] = {"error": str(e)[:200]}
        flag = ""
        size = results[name].get("max_method_code_size", 0)
        if size > 8000:
            flag = "  <-- over JIT HugeMethodLimit (interpreted bytecode)"
        print(f"{name}: {results[name]}{flag}", flush=True)

    over = sorted(
        ((v.get("max_method_code_size", 0), k) for k, v in results.items()),
        reverse=True,
    )
    print("\nTop over-limit:")
    for size, name in over[:25]:
        if size > 8000:
            print(f"  {size:>7}  {name}")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
