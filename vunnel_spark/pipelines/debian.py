"""The Debian pipeline — SURVEY §7.2 phase 7.

Reference flow (/root/reference/src/vunnel/providers/debian/parser.py):

    DSA list text parse (E5, stateful line machine -> fill-down windows)
    ->  sibling CVE fill-down across DSA revisions (J3, :214-260)
    ->  CVE rows x DSA advisory left join + list assembly (J2, :109-137)
    ->  urgency -> severity normalization + max-merge (P8/A2, :356-377)
    ->  record assembly: FixedIn[] per (release_ns, cve) (A1/O2, :329-351)
    ->  legacy union-merge, current wins on (ns, vid) (J14, :495-618)
    ->  envelope -> dedup-on-write sink

REDUCED SURFACE (documented): the reference also stamps per-FixedIn
VendorAdvisory (DSA summary / NoAdvisory-on-nodsa / empty, :430-445)
and an Available date via fixdate.best with the first matched DSA's
date as an accurate candidate (:447-471).  This pipeline models the
advisory LIST (the '|'-joined sorted union) but not those two derived
fields; the exact best() cap semantics those fields need are gated
through osv1 (pipelines/osv.py) and the advisory-candidate reductions
through fedora1/photon1 — a user wiring Debian Available dates
composes join_advisories' matched set with that same operator.

The text-parse stage lives in queries/explode.py e5 (gate-checked on its
own); this module composes the relational stages on already-parsed frames
so the same DAG runs on any DSA source.  Every stage is a named function;
the composed run is one lazy DAG.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vunnel_spark.sinks.writers import EnvelopeWriter, envelope

_SEVERITY_RANK = {
    "Unknown": 0, "Negligible": 1, "Low": 2, "Medium": 3, "High": 4, "Critical": 5,
}


def fill_sibling_cves(dsas: DataFrame) -> DataFrame:
    """J3: DSA revisions share a base id; a revision with no CVE list
    inherits the list from the sibling that has one (parser.py:214-260).

    Input:  (dsa_base, rev, pkg, cves array<string>) — empty array = none.
    A windowed ``max_by`` per base replaces a self-join: one shuffle on
    dsa_base.  The pick key prefers the longest CVE list, tie-broken by
    the highest ``rev`` (assumed < 1e9, true of any DSA revision count),
    so the fill is total-ordered and deterministic.
    """
    w = Window.partitionBy("dsa_base")
    filled = F.max_by(
        F.col("cves"),
        F.size("cves").cast("long") * F.lit(1_000_000_000) + F.col("rev"),
    ).over(w)
    return dsas.withColumn(
        "cves", F.when(F.size("cves") > 0, F.col("cves")).otherwise(filled)
    )


def explode_advisories(dsas: DataFrame) -> DataFrame:
    """(dsa_base, rev, pkg, cves[]) -> (dsa_id, pkg, cve) rows."""
    return dsas.select(
        F.concat_ws("-", F.lit("DSA"), F.col("dsa_base"), F.col("rev")).alias("dsa_id"),
        "pkg",
        F.explode("cves").alias("cve"),
    )


def join_advisories(cve_rows: DataFrame, advisories: DataFrame) -> DataFrame:
    """J2: per (pkg, cve) fix row, collect the sorted matching DSA list;
    unmatched rows carry the empty string (parser.py:109-137, 426-434)."""
    return (
        cve_rows.join(advisories, ["pkg", "cve"], "left")
        .groupBy("ns", "cve", "pkg", "fixed_version", "urgency")
        .agg(
            F.concat_ws("|", F.array_sort(F.collect_list("dsa_id"))).alias("advisories")
        )
    )


def normalize_severity(df: DataFrame) -> DataFrame:
    """P8: urgency -> canonical severity via the EXACT reference map
    (functions/severity.debian_severity — parser.py:356-374: low/low**,
    medium/medium**, high/high**, unimportant, case-sensitive; anything
    else falls back to the record's nvd severity when the DAG carries
    one, else Unknown).  Until r14 this used a reduced map without the
    ``**`` variants or the nvd fallback — the last un-re-audited token
    domain from the r12-r13 severity vocabulary sweeps."""
    from vunnel_spark.functions.severity import debian_severity

    nvd = (
        F.col("nvd_severity")
        if "nvd_severity" in df.columns
        else F.lit(None).cast("string")
    )
    return df.withColumn("severity", debian_severity(F.col("urgency"), nvd))


def assemble_records(df: DataFrame) -> DataFrame:
    """A1 + A2 + O2: one record per (ns, cve): severity max-merge across
    package rows, deterministically sorted FixedIn[] and advisory union."""
    rank = F.create_map(
        *[F.lit(x) for kv in _SEVERITY_RANK.items() for x in kv]
    )
    return (
        df.groupBy("ns", F.col("cve").alias("vid"))
        .agg(
            F.max_by("severity", rank[F.col("severity")]).alias("severity"),
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("pkg").alias("Name"), F.col("fixed_version").alias("Version"))
                )
            ).alias("FixedIn"),
            F.concat_ws(
                "|",
                F.array_remove(
                    F.array_sort(
                        F.array_distinct(
                            F.flatten(F.collect_list(F.split("advisories", r"\|")))
                        )
                    ),
                    "",
                ),
            ).alias("advisories"),
        )
    )


def merge_legacy(current: DataFrame, legacy: DataFrame | None) -> DataFrame:
    """J14: legacy records merged under current; current wins on (ns, vid)
    (parser.py:495-618).  Priority dedup via one window, no self-join."""
    if legacy is None:
        return current.withColumn("from_legacy", F.lit(False))
    cur = current.withColumn("source_priority", F.lit(0))
    leg = legacy.withColumn("source_priority", F.lit(1))
    u = cur.unionByName(leg)
    w = Window.partitionBy("ns", "vid").orderBy("source_priority")
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "ns", "vid", "severity", "FixedIn", "advisories",
            (F.col("source_priority") == 1).alias("from_legacy"),
        )
    )


def debian_pipeline(
    spark: SparkSession,
    dsas: DataFrame,
    cve_rows: DataFrame,
    out_path: str,
    legacy: DataFrame | None = None,
) -> DataFrame:
    """Full provider run on parsed frames; returns the sink read-back.

    dsas:     (dsa_base int, rev int, pkg string, cves array<string>)
    cve_rows: (ns string, cve string, pkg string, fixed_version string,
               urgency string)
    legacy:   (ns, vid, severity, FixedIn, advisories) or None
    """
    advisories = explode_advisories(fill_sibling_cves(dsas))
    joined = normalize_severity(join_advisories(cve_rows, advisories))
    records = merge_legacy(assemble_records(joined), legacy)
    env = envelope(
        records.withColumn("identifier", F.concat_ws("/", "ns", "vid")),
        "schema/vulnerability/os/v1",
        "identifier",
        ["ns", "vid", "severity", "FixedIn", "advisories", "from_legacy"],
    )
    writer = EnvelopeWriter(os.path.join(out_path, "results"), dedup="last_wins")
    writer.write(env)
    return writer.read(spark)
