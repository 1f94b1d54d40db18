"""The Ubuntu pipeline — SURVEY §7.2 phases 10-11: frozen per-ecosystem
fragments + Pro-to-base wont-fix inference at yield time.

Reference flow (/root/reference/src/vunnel/providers/ubuntu/parser.py:
307-373 fragment writing with DELETE_BEFORE_WRITE per ecosystem;
375-425 _iter_fragments; 457-495 base-with-inferences merge):

    today's tarball  ->  slice records by ecosystem
    -> rewrite ONLY the fragments for ecosystems present today   [I6]
       (EOL'd ecosystems stay frozen on disk)
    -> yield Pro fragments verbatim
    -> yield base fragments MERGED with inference: any (cve, pkg) a
       sibling Pro fragment has that base lacks becomes a synthesized
       base wont-fix row — Canonical encodes "only fixed in Pro" by
       omitting the base entry                                    [J3/J7]
    -> fix-date patching at yield time, NOT baked into fragments  [I4/J9]
       (fixdate-cache improvements reach frozen fragments without
       rewriting them)

Spark form: fragments are a parquet table partitioned by ecosystem;
"rewrite only today's ecosystems" is dynamic partition overwrite; the
inference is an anti-join between the Pro slice and the base slice on
(base_eco, cve, pkg); yield-time fix dates are a join against the
first-observed store.

Scale notes: partition pruning makes a per-ecosystem read touch one
directory; the inference anti-join keys on (eco, cve, pkg) — one shuffle
each side; fix-date state is broadcast-size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vunnel_spark.sinks.writers import first_observed_merge, overwrite_partitions

#: fragment row model: one row per (ecosystem, cve, source package)
FRAGMENT_COLS = ["ecosystem", "cve_id", "pkg", "status", "fixed_version"]


def pro_to_base(eco_col) -> "F.Column":
    """'ubuntu:pro:22.04' -> 'ubuntu:22.04'; non-Pro ecosystems map to
    themselves (reference: pro_to_base_ecosystem)."""
    return F.regexp_replace(eco_col, r"(?i):pro:", ":")


def write_fragments(today: DataFrame, fragments_path: str) -> None:
    """I6: rewrite exactly the ecosystem partitions present in today's
    data; absent (EOL'd) ecosystems stay frozen (parser.py:307-373
    DELETE_BEFORE_WRITE per opened fragment)."""
    overwrite_partitions(today, fragments_path, "ecosystem")


def infer_base_wontfix(frags: DataFrame) -> DataFrame:
    """J7: synthesize base wont-fix rows for (cve, pkg) tuples a Pro
    fragment covers but the base fragment omits (parser.py:457-495).

    Runs from CURRENT Pro data on every yield, so after a base ecosystem
    EOLs the inferences keep layering on top of its frozen fragment.
    """
    pro = frags.filter(F.col("ecosystem") != pro_to_base(F.col("ecosystem")))
    pro_pairs = pro.select(
        pro_to_base(F.col("ecosystem")).alias("ecosystem"), "cve_id", "pkg"
    ).distinct()
    base_pairs = frags.select("ecosystem", "cve_id", "pkg")
    return pro_pairs.join(
        base_pairs, ["ecosystem", "cve_id", "pkg"], "left_anti"
    ).select(
        "ecosystem",
        "cve_id",
        "pkg",
        F.lit("wont_fix_inferred").alias("status"),
        F.lit(None).cast("string").alias("fixed_version"),
    )


def ubuntu_pipeline(
    spark: SparkSession,
    today: DataFrame,
    workdir: str,
    state_path: str | None = None,
    today_date: str | None = None,
) -> DataFrame:
    """One provider run: overwrite today's fragments, then yield the FULL
    fragment store (frozen ecosystems included) with Pro-to-base
    inference and yield-time fix dates applied."""
    frag_path = os.path.join(workdir, "fragments")
    write_fragments(today, frag_path)
    frags = spark.read.parquet(frag_path).select(*FRAGMENT_COLS)
    merged = frags.withColumn("origin", F.lit("real")).unionByName(
        infer_base_wontfix(frags).withColumn("origin", F.lit("inferred"))
    )
    if state_path:
        keys = merged.select("ecosystem", "cve_id", "pkg").distinct()
        observed = first_observed_merge(
            spark, state_path, keys, ["ecosystem", "cve_id", "pkg"], today=today_date
        )
        merged = merged.join(observed, ["ecosystem", "cve_id", "pkg"], "left")
    return merged
