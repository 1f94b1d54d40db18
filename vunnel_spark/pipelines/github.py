"""GitHub Security Advisory pipeline — SURVEY §7.2 phase 9.

Reference flow (/root/reference/src/vunnel/providers/github/parser.py and
__init__.py:73-120): GraphQL advisory nodes carry a vulnerability-node
list; each node's GitHub ecosystem maps through ``ecosystem_map``
(parser.py:42-55) or the node is dropped; a fix record keeps
``firstPatchedVersion`` (or the literal string "None") and the
vulnerableVersionRange with commas stripped (parser.py:695-757).  The
provider then emits ONE record per (advisory, ecosystem), with FixedIn
filtered to that ecosystem and identifier ``github:{eco}/{ghsa_id.lower()}``
(__init__.py:79-94).  CVE ids are the advisory identifiers that are not
GHSA ids (parser.py:790-800); severities normalize UPPER -> canonical
(parser.py:576-602).

Spark form: the per-node loop is a projection over a literal map column
(pure Catalyst, no UDF); the per-ecosystem fan-out is the natural
``groupBy(ghsa_id, ecosystem)`` — no explode of a pre-built list, the
records never exist in unfiltered form.  The advisory-metadata join is
a broadcast at real feed sizes (advisories ≪ vulnerability nodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: parser.py:42-55 — GitHub ecosystem -> grype namespace ecosystem
ECOSYSTEM_MAP = {
    "COMPOSER": "composer",
    "ERLANG": "erlang",
    "GO": "go",
    "MAVEN": "java",
    "NPM": "npm",
    "NUGET": "nuget",
    "PIP": "python",
    "PUB": "dart",
    "RUBYGEMS": "gem",
    "RUST": "rust",
    "SWIFT": "swift",
    "ACTIONS": "github-action",
}

#: parser.py:595-601 — feed severity (UPPER) -> canonical
SEVERITY_MAP = {
    "LOW": "Low",
    "MODERATE": "Medium",
    "HIGH": "High",
    "CRITICAL": "Critical",
}


def map_ecosystems(vuln_nodes: DataFrame) -> DataFrame:
    """Map the GitHub ecosystem label; drop unmapped nodes (the reference's
    'dropping github vuln from unmapped ecosystem' branch)."""
    m = F.create_map(*[F.lit(x) for kv in ECOSYSTEM_MAP.items() for x in kv])
    return (
        vuln_nodes.withColumn("ecosystem", m[F.col("github_ecosystem")])
        .filter(F.col("ecosystem").isNotNull())
    )


def fix_records(nodes: DataFrame) -> DataFrame:
    """One FixedIn record per surviving node: name, fix version (or the
    literal 'None'), comma-stripped range, github:{eco} namespace."""
    return nodes.select(
        "ghsa_id",
        "ecosystem",
        F.concat_ws(
            ":",
            F.col("pkg"),
            F.coalesce(F.col("first_patched"), F.lit("None")),
            # .get('vulnerableVersionRange', '') — a missing range is the
            # EMPTY string, not a skipped serialization token
            F.regexp_replace(F.coalesce(F.col("vrange"), F.lit("")), ",", ""),
        ).alias("fix"),
    )


def github_pipeline(advisories: DataFrame, vuln_nodes: DataFrame) -> DataFrame:
    """advisories: (ghsa_id, severity, identifiers array<string>, withdrawn)
    vuln_nodes:  (ghsa_id, github_ecosystem, pkg, first_patched, vrange)

    Returns one row per (advisory, mapped ecosystem): the reference's
    per-ecosystem write loop (__init__.py:79-94) as a single groupBy+join.
    """
    per_eco = (
        fix_records(map_ecosystems(vuln_nodes))
        .groupBy("ghsa_id", "ecosystem")
        .agg(
            F.concat_ws("|", F.array_sort(F.collect_list("fix"))).alias("fixed_in"),
            F.count(F.lit(1)).alias("n_fixes"),
        )
    )
    sev = None
    for raw, cooked in SEVERITY_MAP.items():
        sev = (F.when(F.col("severity") == raw, cooked) if sev is None
               else sev.when(F.col("severity") == raw, cooked))
    meta = advisories.select(
        "ghsa_id",
        sev.otherwise(F.lit("Unknown")).alias("severity_norm"),
        F.array_join(
            F.array_sort(
                # parser.py:783 tests the bare 'GHSA' prefix, no dash
                F.filter("identifiers", lambda v: ~v.startswith("GHSA"))
            ),
            "|",
        ).alias("cves"),
        "withdrawn",
    )
    return per_eco.join(F.broadcast(meta), "ghsa_id").select(
        F.concat(
            F.lit("github:"), F.col("ecosystem"), F.lit("/"), F.lower(F.col("ghsa_id"))
        ).alias("identifier"),
        F.col("severity_norm").alias("severity"),
        "cves",
        "fixed_in",
        "n_fixes",
        "withdrawn",
    )
