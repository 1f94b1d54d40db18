#!/usr/bin/env python
"""Generate large-SF benchmark data by key-shifted replication of sf0.1.

Usage: python scripts/make_scale_data.py [factor] [out_dir]
       (default: 10x -> /root/repo/.scaledata/sf1)

The driver testdata tops out at sf0.1; the scale-curve (VERDICT r8 next
step #1) needs an sf1-shaped corpus to measure how every plan's runtime
actually scales.  This builds one by unioning FACTOR key-shifted copies
of the sf0.1 tables:

- region/nation stay fixed (dimension tables don't scale in TPC-H
  either);
- fact/dim keys shift per copy (o_orderkey/l_orderkey +10M*i, all other
  keys +1M*i) so joins keep referential integrity and key cardinality
  scales linearly;
- documents get a per-copy word suffix ('_i' on every token) so
  within-copy near-duplicate structure is preserved but NO cross-copy
  near-dups appear (plain replication would create artificial clusters
  of 10 identical docs and quadratically inflate LSH candidate pairs —
  the wrong workload);
- embeddings perturb by a tiny per-copy offset for the same reason;
- events keep their time window (rate scales 10x, like a busier
  stream) with shifted user/event ids.

This is TIMING data only — oracles never run against it (value
distributions shift slightly, e.g. `key % k` expressions over shifted
keys), which is fine: correctness is gated at sf0.001-0.1, the curve
measures plan scaling.
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"

# key offsets per copy: must exceed the max key in the source tables
# (asserted below)
BIG = 10_000_000   # o_orderkey / l_orderkey / event_id
SMALL = 1_000_000  # every other key


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".scaledata", "sf1")
    )
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    from vunnel_spark.session import get_spark, load_table

    spark = get_spark("make_scale_data")

    def shifted(df, shifts: dict, i: int):
        for col, step in shifts.items():
            df = df.withColumn(col, F.col(col) + F.lit(i * step))
        return df

    def replicate(name: str, shifts: dict, extra=None, n_out: int = 32):
        df = load_table(spark, SRC, name)
        for col, step in shifts.items():
            mx = df.agg(F.max(col)).collect()[0][0]
            assert mx < step, (name, col, mx, step)
        parts = []
        for i in range(factor):
            part = shifted(df, shifts, i)
            if extra is not None:
                part = extra(part, i)
            parts.append(part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(n_out).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        print(f"{name}: x{factor} written")

    # fixed dims: straight copy
    for name in ("region", "nation"):
        load_table(spark, SRC, name).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        print(f"{name}: copied")

    replicate("customer", {"c_custkey": SMALL}, n_out=8)
    replicate("supplier", {"s_suppkey": SMALL}, n_out=2)
    replicate("part", {"p_partkey": SMALL}, n_out=8)
    replicate("orders", {"o_orderkey": BIG, "o_custkey": SMALL}, n_out=16)
    replicate(
        "lineitem",
        {"l_orderkey": BIG, "l_partkey": SMALL, "l_suppkey": SMALL},
        n_out=32,
    )
    replicate("events", {"event_id": BIG, "user_id": SMALL}, n_out=16)

    def doc_suffix(df, i):
        if i == 0:
            return df
        out = df.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", f"$1_{i}")
        )
        return out.withColumn("n_chars", F.length("text").cast(
            df.schema["n_chars"].dataType.simpleString()))

    replicate("documents", {"doc_id": SMALL}, extra=doc_suffix, n_out=8)

    def emb_perturb(df, i):
        if i == 0:
            return df
        return df.withColumn(
            "embedding",
            F.transform("embedding", lambda x: x + F.lit(i * 1e-4)).cast(
                df.schema["embedding"].dataType.simpleString()
            ),
        )

    replicate("embeddings", {"vec_id": SMALL}, extra=emb_perturb, n_out=4)
    print(f"done -> {out_dir}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
