#!/usr/bin/env python
"""Stage-by-stage decomposition of ghsa1_per_ecosystem_dag (guide §1.4).

Usage: python scripts/decompose_ghsa1.py [sf_dir] [out_json] [runs]

Cumulative slices, noop sink, 1 warm-up + N measured (median):

  nodes       vuln_nodes synthesis + ecosystem map (lineitem scan)
  fixdim      the first-observed store dim build (scan + normalize +
              4-key groupBy)
  fixjoin     nodes LEFT JOIN fixdim on the 4-key (the §3 target)
  per_eco     + groupBy(ghsa_id, ecosystem) collect_list fold
  envelope    advisories + cvss_severities_envelope alone (orders scan)
  full        the registered query
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

    os.environ.setdefault("VS_SCAN_MIN_PARTITIONS", "32")

    from pyspark.sql import functions as F

    from vunnel_spark.registry import all_queries
    from vunnel_spark.session import get_spark

    spark = get_spark("decompose_ghsa1")
    qs = all_queries()

    # rebuild the query's building blocks by importing its module-level
    # pieces: the query function itself is the only public surface, so
    # the slices re-derive the frames the same way it does
    import vunnel_spark.queries.pipelines_q as pq  # noqa: F401 - registry import side effect

    # reconstruct via the pipeline functions over the same synthesized
    # inputs the query builds (copy of the construction in pipelines_q)
    from vunnel_spark.functions.fixdate import (
        normalize_fixdate_ecosystem,
        normalize_fixdate_package,
    )
    from vunnel_spark.pipelines.github import ECOSYSTEM_MAP, map_ecosystems
    from vunnel_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    ecos = ["COMPOSER", "ERLANG", "GO", "MAVEN", "NPM", "NUGET", "PIP", "PUB",
            "RUBYGEMS", "RUST", "SWIFT", "ACTIONS", "DEB", "RPM", "OTHER"]
    pkg_tok = F.when(
        F.col("l_partkey") % 9 == 0,
        F.concat(F.lit("pkg_"), (F.col("l_partkey") % 50).cast("string")),
    ).otherwise(F.concat(F.lit("pkg"), (F.col("l_partkey") % 50).cast("string")))
    vuln_nodes = li.filter(F.col("l_orderkey") % 2 == 0).select(
        F.concat(F.lit("GHSA-"), F.col("l_orderkey").cast("string")).alias("ghsa_id"),
        F.element_at(
            F.array(*[F.lit(e) for e in ecos]),
            (F.col("l_suppkey") % 15 + 1).cast("int"),
        ).alias("github_ecosystem"),
        pkg_tok.alias("pkg"),
        F.when(
            F.col("l_linenumber") % 5 != 0,
            F.concat_ws(".", F.col("l_quantity").cast("int"), F.col("l_linenumber")),
        ).alias("first_patched"),
        F.concat(
            F.lit(">= 1.0, < "), F.col("l_quantity").cast("int").cast("string")
        ).alias("vrange"),
    )
    eco_m = F.create_map(*[F.lit(x) for kv in ECOSYSTEM_MAP.items() for x in kv])
    _mapped_eco = eco_m[
        F.element_at(
            F.array(*[F.lit(e) for e in ecos]),
            (F.col("l_suppkey") % 15 + 1).cast("int"),
        )
    ]
    _store_eco = normalize_fixdate_ecosystem(_mapped_eco)
    fd_src = li.filter(
        (F.col("l_orderkey") % 2 == 0)
        & ((F.col("l_orderkey") + F.col("l_partkey")) % 3 == 0)
        & _mapped_eco.isNotNull()
    ).select(
        F.concat(F.lit("GHSA-"), F.col("l_orderkey").cast("string")).alias("ghsa_id"),
        normalize_fixdate_package(pkg_tok, _store_eco).alias("pkg"),
        _store_eco.alias("ecosystem"),
        F.concat_ws(
            ".", F.col("l_quantity").cast("int"), F.col("l_linenumber")
        ).alias("fix_version"),
        F.date_add(
            F.to_date(F.lit("2020-01-01")), (F.col("l_partkey") % 900).cast("int")
        ).alias("date"),
        F.when(F.col("l_partkey") % 4 == 0, "grype-db")
        .otherwise("observed")
        .alias("kind"),
    )
    fixdates = fd_src.groupBy("ghsa_id", "pkg", "ecosystem", "fix_version").agg(
        F.min("date").alias("date"), F.min("kind").alias("kind")
    )

    from vunnel_spark.pipelines.github import fix_records

    mapped = fix_records(map_ecosystems(vuln_nodes), fixdates)
    per_eco = mapped.groupBy("ghsa_id", "ecosystem").agg(
        F.concat_ws("|", F.array_sort(F.collect_list("fix"))).alias("fixed_in"),
        F.count(F.lit(1)).alias("n_fixes"),
    )

    slices = {
        "nodes": map_ecosystems(vuln_nodes),
        "fixdim": fixdates,
        "fixjoin": mapped,
        "per_eco": per_eco,
        "full": qs["ghsa1_per_ecosystem_dag"](spark, sf_dir),
    }

    results = {}
    for name, df in slices.items():
        samples = []
        for r in range(runs + 1):
            spark.sparkContext.setJobDescription(f"decompose_ghsa1:{name}:{r}")
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
