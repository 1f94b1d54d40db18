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


#: OSV→OS downconvert constants (reference os_downconvert.py:46-59)
_UBUNTU_PKG_VERSION_FORMAT = "dpkg"
_UBUNTU_CVE_URL_PREFIX = "https://ubuntu.com/security/"
_ESM_SUFFIX = "+esm"
_BASE_ECO_RE = r"^Ubuntu:(\d+\.\d+)(?::LTS)?$"
_PLAIN_PRO_ECO_RE = r"^Ubuntu:Pro:(\d+\.\d+)(?::LTS)?$"
_SEVERITY_NAMES = ["Negligible", "Low", "Medium", "High", "Critical"]


def osv_ecosystem_to_os_namespace(eco, include_esm: bool = True):
    """Map an OSV ecosystem string to a ``ubuntu:<ver>[+esm]`` namespace
    Column (reference os_downconvert.py:62-87).

    Base releases (``Ubuntu:22.04[:LTS]``) map to ``ubuntu:22.04``; plain
    Ubuntu Pro (``Ubuntu:Pro:X.YY[:LTS]``) maps to the ``ubuntu:X.YY+esm``
    distro channel when ``include_esm``; FIPS / FIPS-updates / Realtime /
    Nvidia-BlueField tiers fail both anchored regexes and map to NULL —
    their builds diverge from base, so their fixes can't resolve a base
    disclosure.
    """
    base = F.regexp_extract(eco, _BASE_ECO_RE, 1)
    ns = F.when(base != "", F.concat(F.lit("ubuntu:"), base))
    if include_esm:
        pro = F.regexp_extract(eco, _PLAIN_PRO_ECO_RE, 1)
        ns = ns.when(pro != "", F.concat(F.lit("ubuntu:"), pro, F.lit(_ESM_SUFFIX)))
    return ns


def _severity_from_osv(sev_arr):
    """severity[type=Ubuntu].score → v3 Severity name (os_downconvert.py:
    90-114): capitalize, 'Untriaged'/unrecognized/absent → 'Unknown'."""
    ubuntu = F.filter(sev_arr, lambda s: s["type"] == F.lit("Ubuntu"))
    cap = F.initcap(F.trim(F.get(ubuntu, 0)["score"]))
    return F.when(cap.isin(_SEVERITY_NAMES), cap).otherwise(F.lit("Unknown"))


def osv_to_os(osv: DataFrame, include_esm: bool = True) -> DataFrame:
    """Downconvert OSV envelopes into flat v3 OS-schema Vulnerability rows
    (reference os_downconvert.py:203-244 osv_to_os + 152-200
    _fixed_in_for_affected), entirely in Catalyst higher-order functions —
    the nested affected[]/ranges[]/events[] walk never leaves the JVM.

    Input schema (OSV envelope, anchore metadata lifted to ``fixes`` /
    ``status`` fields):

      record_id string, withdrawn string, upstream array<string>,
      severity array<struct<type,score>>,
      affected array<struct<
        package struct<ecosystem,name>,
        ranges array<struct<events array<struct<fixed>>,
                            fixes array<struct<version,date,kind>>>>,
        status string>>

    Emits one row per FixedIn entry (plus one null-FixedIn row for a base
    record whose affected entries all produced nothing — v3 emitted the
    record with ``FixedIn: []``).  Encoding rules:

      - withdrawn / no upstream CVE / no namespace-mapping affected → drop
      - fixed events → one FixedIn per ``fixed`` version, NoAdvisory=false,
        Available date/kind looked up in ranges[].fixes by version
      - no fixed events on a base channel → Version='None', NoAdvisory =
        (status == 'wont-fix')
      - no fixed events on a ``+esm`` channel → nothing (the base wont-fix
        is the sole disclosure); an all-unfixed +esm record is dropped

    Scale: per-record array work only — no shuffle, no UDF; the operator
    is a single whole-stage-codegen projection + two generator nodes.
    """
    name = F.get(F.col("upstream"), 0)
    rec = osv.filter(
        F.col("withdrawn").isNull() & name.isNotNull() & (name != "")
    )

    ns_of = lambda a: osv_ecosystem_to_os_namespace(  # noqa: E731
        a["package"]["ecosystem"], include_esm=include_esm
    )

    def fixed_in_for(a):
        """affected[] entry → array of FixedIn structs (os_downconvert.py
        _fixed_in_for_affected)."""
        ns = ns_of(a)
        pkg = a["package"]["name"]
        fvs = F.filter(
            F.flatten(
                F.transform(a["ranges"], lambda r: F.transform(r["events"], lambda e: e["fixed"]))
            ),
            lambda v: v.isNotNull() & (v != ""),
        )
        all_fixes = F.flatten(F.transform(a["ranges"], lambda r: r["fixes"]))
        fixed_entries = F.transform(
            fvs,
            lambda v: F.struct(
                pkg.alias("Name"),
                ns.alias("NamespaceName"),
                F.lit(_UBUNTU_PKG_VERSION_FORMAT).alias("VersionFormat"),
                v.alias("Version"),
                F.lit(False).alias("NoAdvisory"),
                F.get(
                    F.filter(
                        all_fixes,
                        lambda fx: (fx["version"] == v)
                        & fx["date"].isNotNull()
                        & (fx["date"] != ""),
                    ),
                    0,
                ).alias("Fix"),
            ),
        )
        none_entry = F.array(
            F.struct(
                pkg.alias("Name"),
                ns.alias("NamespaceName"),
                F.lit(_UBUNTU_PKG_VERSION_FORMAT).alias("VersionFormat"),
                F.lit("None").alias("Version"),
                F.coalesce(a["status"] == "wont-fix", F.lit(False)).alias("NoAdvisory"),
                F.lit(None)
                .cast("struct<version:string,date:string,kind:string>")
                .alias("Fix"),
            )
        )
        # an EMPTY (not null) array — flatten() propagates a null element
        empty = F.slice(none_entry, 1, 0)
        return (
            F.when(ns.isNull() | pkg.isNull() | (pkg == ""), empty)
            .when(F.size(fvs) > 0, fixed_entries)
            .when(ns.endswith(_ESM_SUFFIX), empty)
            .otherwise(none_entry)
        )

    ns_arr = F.filter(
        F.transform(F.col("affected"), ns_of), lambda x: x.isNotNull()
    )
    shaped = rec.select(
        "record_id",
        name.alias("vuln_name"),
        F.get(ns_arr, 0).alias("namespace"),
        _severity_from_osv(F.col("severity")).alias("severity"),
        F.concat(F.lit(_UBUNTU_CVE_URL_PREFIX), name).alias("link"),
        F.flatten(F.transform(F.col("affected"), fixed_in_for)).alias("fixed_in"),
    ).filter(
        F.col("namespace").isNotNull()
        & ~(F.col("namespace").endswith(_ESM_SUFFIX) & (F.size("fixed_in") == 0))
    )
    return shaped.select(
        F.concat_ws("/", "namespace", F.lower("vuln_name")).alias("identifier"),
        "vuln_name",
        "namespace",
        "severity",
        "link",
        F.explode_outer("fixed_in").alias("fi"),
    ).select(
        "identifier",
        "vuln_name",
        "namespace",
        "severity",
        "link",
        F.col("fi.Name").alias("fixed_name"),
        F.col("fi.VersionFormat").alias("version_format"),
        F.col("fi.Version").alias("version"),
        F.col("fi.NoAdvisory").alias("no_advisory"),
        F.col("fi.Fix.date").alias("available_date"),
        F.col("fi.Fix.kind").alias("available_kind"),
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
