"""The RHEL pipeline — SURVEY §7.2 phase 9: the `_parse_cve` join DAG.

Reference flow (/root/reference/src/vunnel/providers/rhel/parser.py:821-1000):

    affected_release rows (fins) + package_state rows (nfins)
    -> severity normalization (case fold + rank map)
    -> not-fixed trumps fixed                         [J12 anti-join]
    -> base-platform inference for EUS/ELS-only data  [J13 anti-join union]
    -> '+els' platform suppression                    [P2 filter]
    -> per-(cve, platform) record assembly            [A1/O2 sorted FixedIn,
       wont_fix advisories, 'None' versions for unfixed packages]

The reference walks dicts per CVE; here every step is one frame-level
join/filter over ALL CVEs at once — the per-CVE loop disappears into the
partitioning.

Scale notes: every join keys on (cve_id, platform, package, module) or a
prefix — co-partitioned throughout, one shuffle each; the inference
anti-join touches only distinct platform keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: reference severity fold (parser.py:835-855)
_SEV = {
    "critical": "Critical",
    "important": "High",
    "moderate": "Medium",
    "low": "Low",
}


def normalize_severity(df: DataFrame, col: str = "threat_severity") -> DataFrame:
    """Severity case-fold + rank mapping; anything unrecognized -> Unknown."""
    lowered = F.lower(F.col(col))
    expr = F.lit("Unknown")
    for raw, mapped in reversed(list(_SEV.items())):
        expr = F.when(lowered == raw, mapped).otherwise(expr)
    return df.withColumn("severity", expr)


def suppress_not_fixed(fins: DataFrame, nfins: DataFrame) -> DataFrame:
    """J12: a fix row is dropped when the same (cve, platform, package,
    module) is still affected/out-of-support (parser.py:858-877 'not fixed
    trumps fixes'); the not-fixed rows themselves become wont-fix records
    with version 'None'."""
    keys = ["cve_id", "platform", "package", "module"]
    kept_fins = fins.join(nfins.select(*keys).distinct(), keys, "left_anti")
    nf_records = nfins.select(
        *keys,
        F.lit("None").alias("version"),
        F.lit(None).cast("string").alias("rhsa_id"),
        F.lit(True).alias("wont_fix"),
    )
    return kept_fins.withColumn("wont_fix", F.lit(False)).unionByName(nf_records)


def infer_base_platforms(artifacts: DataFrame) -> DataFrame:
    """J13: extended-support-only platforms synthesize base-platform
    records (version 'None', wont_fix) when the base platform has no data
    of its own (parser.py:883-905 via _get_base_platform:785-799).

    The base rule is ASYMMETRIC and exact (r12 fidelity pass — a suffix
    strip is wrong twice over): '+eus' platforms map to their MAJOR
    version ('8.6+eus' -> '8', the reference's split('.')[0]; a
    minorless '8+eus' maps to itself and so never infers), '+els'
    platforms drop only the suffix ('6+els' -> '6', minor kept), and
    every other form — including '+aus'/'+tus', which _parse_platform
    can never emit — has no base and never infers.  One inferred row is
    emitted PER SOURCE ARTIFACT, duplicates included: the reference
    appends every artifact of every extended platform sharing the base
    into one record, so two eus minors fixing the same package yield
    two identical FixedIn entries (parser.py:893-902 has no dedup).
    """
    base = F.when(
        F.col("platform").contains("+eus"),
        F.split(F.col("platform"), r"\.")[0],
    ).when(
        F.col("platform").contains("+els"),
        F.regexp_replace("platform", r"\+els", ""),
    )
    with_base = artifacts.withColumn("_base", base)
    candidates = with_base.filter(
        F.col("_base").isNotNull() & (F.col("_base") != F.col("platform"))
    )
    present = artifacts.select("cve_id", F.col("platform").alias("_base")).distinct()
    inferred = candidates.join(present, ["cve_id", "_base"], "left_anti").select(
        "cve_id",
        F.col("_base").alias("platform"),
        "package",
        "module",
        F.lit("None").alias("version"),
        F.lit(None).cast("string").alias("rhsa_id"),
        F.lit(True).alias("wont_fix"),
    )
    return artifacts.drop("_base").unionByName(inferred)


def drop_els(artifacts: DataFrame) -> DataFrame:
    """P2: '+els' platforms are never emitted (parser.py:907-909)."""
    return artifacts.filter(~F.col("platform").contains("+els"))


def assemble_records(artifacts: DataFrame, meta: DataFrame) -> DataFrame:
    """A1/O2: one record per (cve_id, platform) with a deterministically
    sorted FixedIn[] and the normalized severity/description joined in
    (parser.py:911-1000)."""
    fixed_in = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("package").alias("Name"),
                F.coalesce(F.col("version"), F.lit("None")).alias("Version"),
                F.col("module").alias("Module"),
                F.col("wont_fix").alias("NoAdvisory"),
                F.col("rhsa_id").alias("RhsaId"),
            )
        )
    )
    recs = artifacts.groupBy("cve_id", "platform").agg(fixed_in.alias("FixedIn"))
    return recs.join(F.broadcast(meta), "cve_id", "left").select(
        "cve_id",
        F.concat(F.lit("rhel:"), F.col("platform")).alias("namespace"),
        "severity",
        "description",
        "FixedIn",
    )


def rhel_pipeline(fins: DataFrame, nfins: DataFrame, meta: DataFrame) -> DataFrame:
    """The composed `_parse_cve` DAG over all CVEs at once.

    fins:  (cve_id, platform, package, module, version, rhsa_id)
    nfins: (cve_id, platform, package, module)
    meta:  (cve_id, threat_severity, description)
    Returns one row per (cve_id, namespace) with sorted FixedIn[].
    """
    artifacts = suppress_not_fixed(fins, nfins)
    artifacts = infer_base_platforms(artifacts)
    artifacts = drop_els(artifacts)
    return assemble_records(artifacts, normalize_severity(meta))
