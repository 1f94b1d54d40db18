#!/usr/bin/env python
"""Stage-by-stage decomposition of e17_ghsa_cvss_envelope (guide §1.4).

Usage: python scripts/decompose_e17.py [sf_dir] [out_json] [runs]

Times cumulative slices of the envelope at the given SF with the noop
sink, one warm-up + N measured (median), cache cleared between runs:

  synth       vector-string synthesis only (the fixture columns)
  grammar     + the two whole-vector grammar rlikes (v3 + v4)
  dup         + the two duplicate-key backreference rlikes
  validity    + the mandatory-metric contains chains (= full _ok cols)
  eval3       + the full with_cvss3_eval score stack
  full        the registered e17 query

The deltas between rows attribute the per-row cost: guide §1.2 says fix
the dominant slice first.
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
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import functions as F

    from vunnel_spark.functions.cvss import (
        CVSS3_MANDATORY,
        CVSS3_METRICS,
        CVSS4_MANDATORY,
        CVSS4_METRICS,
        _whole_vector_res,
        strip_trailing_slash,
        with_cvss3_eval,
        with_cvss4_valid,
    )
    from vunnel_spark.registry import all_queries
    from vunnel_spark.session import get_spark, load_table

    spark = get_spark("decompose_e17")
    qs = all_queries()

    # replicate e17's synthesis columns (queries/explode.py e17)
    o = load_table(spark, sf_dir, "orders")
    n_parts = o.rdd.getNumPartitions()
    cores = spark.sparkContext.defaultParallelism
    if n_parts < max(4, cores * 3 // 4):
        o = o.repartition(cores)  # measurement fanout, same policy as scalecurve
    k = F.col("o_orderkey")
    ck = F.col("o_custkey")
    av = (F.when(k % 4 == 0, "N").when(k % 4 == 1, "A")
          .when(k % 4 == 2, "L").otherwise("P"))
    ac = F.when(k % 2 == 0, "L").otherwise("H")
    pr = F.when(k % 3 == 0, "N").when(k % 3 == 1, "L").otherwise("H")
    ui = F.when(k % 2 == 0, "N").otherwise("R")
    sco = F.when(k % 5 < 3, "U").otherwise("C")
    cc = F.when(k % 3 == 0, "H").when(k % 3 == 1, "L").otherwise("N")
    ic = F.when(k % 5 % 3 == 0, "H").when(k % 5 % 3 == 1, "L").otherwise("N")
    aa = F.when(k % 7 % 3 == 0, "H").when(k % 7 % 3 == 1, "L").otherwise("N")
    ver3 = F.when(k % 2 == 0, "3.1").otherwise("3.0")
    core7 = F.concat(
        F.lit("AV:"), av, F.lit("/AC:"), ac, F.lit("/PR:"), pr,
        F.lit("/UI:"), ui, F.lit("/S:"), sco, F.lit("/C:"), cc,
        F.lit("/I:"), ic,
    )
    core = F.concat(core7, F.lit("/A:"), aa)
    pfx = F.concat(F.lit("CVSS:"), ver3, F.lit("/"))
    kls = (k % 8).cast("int")
    v3_raw = F.when(ck % 7 == 0, F.lit(None).cast("string")).otherwise(
        F.when(kls <= 2, F.concat(pfx, core))
        .when(kls == 3, F.concat(pfx, core, F.lit("/")))
        .when(kls == 4, F.concat(pfx, core, F.lit("/E:F/RL:W")))
        .when(kls == 5, F.concat(F.lit("CVSS:2.0/"), core))
        .when(kls == 6, F.concat(pfx, core7))
        .otherwise(F.concat(pfx, core, F.lit("/XX:N")))
    )
    sfx10 = F.concat(
        F.lit("/AC:"), ac, F.lit("/AT:"),
        F.when(k % 3 < 2, "N").otherwise("P"),
        F.lit("/PR:"), pr, F.lit("/UI:"),
        F.when(k % 3 == 0, "N").when(k % 3 == 1, "P").otherwise("A"),
        F.lit("/VC:"), cc, F.lit("/VI:"), ic, F.lit("/VA:"), aa,
        F.lit("/SC:"),
        F.when((k + 1) % 3 == 0, "H").when((k + 1) % 3 == 1, "L").otherwise("N"),
        F.lit("/SI:"),
        F.when((k + 2) % 3 == 0, "H").when((k + 2) % 3 == 1, "L").otherwise("N"),
    )
    sa4 = (F.when((k + 1) % 5 % 3 == 0, "H").when((k + 1) % 5 % 3 == 1, "L")
           .otherwise("N"))
    jls = (k % 5).cast("int")
    v4_raw = F.when(ck % 3 == 0, F.lit(None).cast("string")).otherwise(
        F.when(jls <= 1, F.concat(F.lit("CVSS:4.0/AV:"), av, sfx10,
                                  F.lit("/SA:"), sa4))
        .when(jls == 2, F.concat(F.lit("CVSS:4.0/AV:"), av, sfx10,
                                 F.lit("/SA:"), sa4, F.lit("/U:Green/")))
        .when(jls == 3, F.concat(F.lit("CVSS:4.0/AV:Q"), sfx10,
                                 F.lit("/SA:"), sa4))
        .otherwise(F.concat(F.lit("CVSS:4.0/AV:"), av, sfx10))
    )

    synth = o.select(
        F.concat(F.lit("GHSA-"), k.cast("string")).alias("ghsa_id"),
        strip_trailing_slash(v3_raw).alias("v3"),
        strip_trailing_slash(v4_raw).alias("v4"),
    )

    g3re, d3re = _whole_vector_res(("CVSS:3.0", "CVSS:3.1"), CVSS3_METRICS)
    g4re, d4re = _whole_vector_res(("CVSS:4.0",), CVSS4_METRICS)

    slices = {}
    slices["synth"] = synth
    slices["grammar"] = synth.select(
        "*",
        F.col("v3").rlike(g3re).alias("g3"),
        F.col("v4").rlike(g4re).alias("g4"),
    )
    slices["dup"] = synth.select(
        "*",
        (F.col("v3").rlike(g3re) & ~F.col("v3").rlike(d3re)).alias("g3"),
        (F.col("v4").rlike(g4re) & ~F.col("v4").rlike(d4re)).alias("g4"),
    )
    ok3 = F.col("v3").rlike(g3re) & ~F.col("v3").rlike(d3re)
    for m in CVSS3_MANDATORY:
        ok3 = ok3 & F.col("v3").contains(f"/{m}:")
    ok4 = F.col("v4").rlike(g4re) & ~F.col("v4").rlike(d4re)
    for m in CVSS4_MANDATORY:
        ok4 = ok4 & F.col("v4").contains(f"/{m}:")
    slices["validity"] = synth.select("*", ok3.alias("g3"), ok4.alias("g4"))
    ev = with_cvss3_eval(synth, F.col("v3"), "_d3")
    ev = with_cvss4_valid(ev, F.col("v4"), "_d4")
    slices["eval3"] = ev.select(
        "ghsa_id", "_d3_ok", "_d3_base", "_d3_esc", "_d3_isc", "_d3_sev",
        "_d3_ver", "_d4_ok",
    )
    slices["full"] = qs["e17_ghsa_cvss_envelope"](spark, sf_dir)

    results = {}
    for name, df in slices.items():
        samples = []
        for r in range(runs + 1):
            spark.sparkContext.setJobDescription(f"decompose_e17:{name}:{r}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            if r:
                samples.append(el)
            spark.catalog.clearCache()
        samples.sort()
        results[name] = {
            "median_sec": round(samples[len(samples) // 2], 3),
            "samples": [round(s, 3) for s in samples],
        }
        print(f"{name}: {results[name]}", flush=True)

    if out_json:
        with open(out_json, "w") as f:
            json.dump({"sf_dir": sf_dir, "slices": results}, f, indent=1)


if __name__ == "__main__":
    main()
