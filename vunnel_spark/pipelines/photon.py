"""VMware Photon OS advisory pipeline (SURVEY §2 provider-family proof).

Reference flow (/root/reference/src/vunnel/providers/photon/parser.py:
52-63 ``cvss_to_severity``, 66-70 ``parse_fixed_version``, 73-103
``_parse_advisory_file``, 106-141 ``parse_advisories``, 232-259
``_build_fixed_in``, 261-309 ``_parse_file``, 311-352
``_patch_fix_date``):

    wiki advisory markdown files (Security-Update(s)-<ver>-<n>.md)
    ->  regex parse: advisory id (PHSA-...), issue date, CVE id set;
        files missing any of the three drop
    ->  per (photon_version, cve_id): the EARLIEST-dated advisory wins
        (parse_advisories' ``date < existing.date`` — strict, so equal
        dates keep the first file encountered; listdir order is
        filesystem-arbitrary, so this pipeline breaks date ties on
        (advisory_id, url) for determinism)
    cve_data_photon<ver>.json entries (cve_id, pkg, cve_score, status,
    res_ver)
    ->  skip entries with no cve_id and BDSA-* records (parser.py:
        268-274 — case-insensitive prefix test)
    ->  FixedIn per entry in input order: 'Not Affected' and
        empty-pkg entries drop; Version = res_ver, with 'NA'/empty
        -> 'None'; rpm format; VendorAdvisory from the advisory map
    ->  a CVE whose FixedIn list ends up empty yields NO record
        (parser.py:282-283), but its dropped entries still feed the
        severity scan: Severity = cvss_to_severity of the FIRST entry
        (input order, all entries) scoring non-Unknown, else Unknown
        (parser.py:286-290)
    ->  record: Link = first reference link, Metadata.Issued =
        advisory date when the map has one
    ->  fix-date patch (parser.py:311-352): FixedIn with Version not
        in ('None', '0') and no Available yet gains
        {advisory date, 'advisory'} when the map hits, else the
        fixdate finder's best (vuln, pkg, version, namespace) record

The reference's two imperative dict passes (cve_map grouping, then a
mutate-in-place date patch) are one groupBy(version, cve_id) whose
FixedIn entries are fully decided pre-aggregation: the advisory map
and the fixdate finder are both namespace-bounded dimensions, so both
join broadcast against the entry fact table, which shuffles exactly
once — on the record key.  At 100 TB of advisory JSON the shape holds:
no per-CVE state lives on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vunnel_spark.pipelines.echo import reference_link

PHOTON_WIKI_BASE_URL = "https://github.com/vmware/photon/wiki"

#: advisory markdown regexes (photon/parser.py:38-41), translated from
#: Python re to Spark's Java regex (same constructs; no behavior change)
_ADVISORY_ID_RE = r"Advisory\s+(?:Id|ID)\s*:\s*(PHSA-\d{4}-(?:\d+\.\d+-)?0*\d+)"
_ISSUE_DATE_RE = r"(?:Issue\s+date|Issued\s+on)\s*:\s*(\d{4}-\d{2}-\d{2})"
_CVE_ID_RE = r"CVE-\d{4}-\d+"
#: start-anchored ONLY — the reference uses re.match (prefix match) plus
#: a separate endswith('.md') pre-filter (photon/parser.py:116-118), so
#: 'Security-Update-3.0-123.md.md' is a valid advisory there; a trailing
#: '$' here would silently drop it (r11 ADVICE).
_ADVISORY_FILENAME_RE = r"^Security-Updates?-(\d+\.\d+)-(\d+)\.md"


def cvss_to_severity(score):
    """CVSS score -> severity tier (photon/parser.py:52-63)."""
    return (
        F.when(score.isNull(), "Unknown")
        .when(score >= 9.0, "Critical")
        .when(score >= 7.0, "High")
        .when(score >= 4.0, "Medium")
        .when(score >= 0.1, "Low")
        .otherwise("Negligible")
    )


def parse_fixed_version(res_ver):
    """'NA'/empty/null res_ver -> 'None' (photon/parser.py:66-70)."""
    return F.when(
        F.coalesce(res_ver, F.lit("")).isin("", "NA"), "None"
    ).otherwise(res_ver)


def advisory_map(files: DataFrame) -> DataFrame:
    """wiki files(filename, content) -> (version, cve_id, advisory_id,
    date, url): the per-(version, cve) EARLIEST advisory.

    Mirrors _parse_advisory_file + parse_advisories (photon/parser.py:
    73-141): non-matching filenames and files missing the advisory id,
    the issue date, or any CVE id drop whole.  Date ties break on
    (advisory_id, url) — the reference keeps whichever file listdir
    yielded first, which is not a stable order to pin.
    """
    # match()+endswith combination, mirroring parser.py:116-118
    parsed = files.where(F.col("filename").endswith(".md")).select(
        F.regexp_extract("filename", _ADVISORY_FILENAME_RE, 1).alias("version"),
        F.regexp_extract("content", _ADVISORY_ID_RE, 1).alias("advisory_id"),
        F.regexp_extract("content", _ISSUE_DATE_RE, 1).alias("date"),
        F.array_distinct(
            F.regexp_extract_all("content", F.lit(_CVE_ID_RE), F.lit(0))
        ).alias("cve_ids"),
        F.concat(
            F.lit(PHOTON_WIKI_BASE_URL + "/"),
            F.regexp_replace("filename", r"\.md$", ""),
        ).alias("url"),
    ).where(
        (F.col("version") != "")
        & (F.col("advisory_id") != "")
        & (F.col("date") != "")
        & (F.size("cve_ids") > 0)
    )
    return (
        parsed.select(
            "version", "advisory_id", "date", "url",
            F.explode("cve_ids").alias("cve_id"),
        )
        .groupBy("version", "cve_id")
        .agg(
            F.min(F.struct("date", "advisory_id", "url")).alias("a")
        )
        .select(
            "version", "cve_id",
            F.col("a.advisory_id").alias("advisory_id"),
            F.col("a.date").alias("advisory_date"),
            F.col("a.url").alias("advisory_url"),
        )
    )


def photon_pipeline(
    entries: DataFrame,
    advisories: DataFrame | None = None,
    fixdates: DataFrame | None = None,
) -> DataFrame:
    """entries(photon_version, pos, cve_id, pkg, cve_score, status,
    res_ver) -> one vulnerability record per surviving CVE.

    ``pos`` is the entry's index in the source JSON array (the
    reference walks the list once and groups by cve_id in encounter
    order — parser.py:268-275).  ``advisories`` is advisory_map()'s
    output; ``fixdates`` the finder dimension (vuln_id, package,
    fix_version, ecosystem, date, kind).  Both dimensions broadcast.
    """
    live = entries.filter(
        F.col("cve_id").isNotNull()
        & (F.col("cve_id") != "")
        & ~F.lower(F.col("cve_id")).startswith("bdsa")
    ).select(
        F.col("photon_version").alias("version"),
        "pos", "cve_id", "pkg", "cve_score", "status",
        parse_fixed_version(F.col("res_ver")).alias("fix_version"),
    )
    if advisories is None:
        adv_cols = [
            F.lit(None).cast("string").alias(c)
            for c in ("advisory_id", "advisory_date", "advisory_url")
        ]
        live = live.select("*", *adv_cols)
    else:
        live = live.join(
            F.broadcast(advisories), ["version", "cve_id"], "left"
        )
    ns = F.concat(F.lit("photon:"), F.col("version"))
    # fix-date patch, decided per entry BEFORE assembly: advisory date
    # wins, else the finder dimension (parser.py:311-352; eligibility =
    # a real fixed version, i.e. not the 'None'/'0' placeholders)
    eligible = ~F.col("fix_version").isin("None", "0")
    if fixdates is not None:
        # the finder lookup key is (vuln, package, version, ecosystem) —
        # parser.py:342-347 — so the namespace joins as a key column,
        # never as a post-join filter (which would drop unmatched rows)
        dim = fixdates.filter(F.col("date").isNotNull()).select(
            F.col("vuln_id").alias("cve_id"),
            F.col("package").alias("pkg"),
            F.col("fix_version"),
            F.col("ecosystem").alias("_eco"),
            F.col("date").alias("_fd_date"),
            F.col("kind").alias("_fd_kind"),
        )
        live = live.withColumn("_eco", F.lower(ns)).join(
            F.broadcast(dim), ["cve_id", "pkg", "fix_version", "_eco"], "left"
        ).drop("_eco")
    else:
        live = live.withColumn("_fd_date", F.lit(None).cast("string")).withColumn(
            "_fd_kind", F.lit(None).cast("string")
        )
    available = (
        F.when(
            eligible & F.col("advisory_date").isNotNull(),
            F.struct(
                F.col("advisory_date").alias("Date"), F.lit("advisory").alias("Kind")
            ),
        )
        .when(
            eligible & F.col("_fd_date").isNotNull(),
            F.struct(F.col("_fd_date").alias("Date"), F.col("_fd_kind").alias("Kind")),
        )
    )
    fixed_in = F.struct(
        F.col("pkg").alias("Name"),
        ns.alias("NamespaceName"),
        F.lit("rpm").alias("VersionFormat"),
        F.col("fix_version").alias("Version"),
        F.lit(None).cast("string").alias("Module"),
        F.when(
            F.col("advisory_id").isNotNull(),
            F.struct(
                F.lit(False).alias("NoAdvisory"),
                F.array(
                    F.struct(
                        F.col("advisory_id").alias("ID"),
                        F.col("advisory_url").alias("Link"),
                    )
                ).alias("AdvisorySummary"),
            ),
        ).alias("VendorAdvisory"),
        available.alias("Available"),
    )
    # null status is NOT 'Not Affected' (parser.py:233 is an equality
    # test on a .get() default) — coalesce so the null survives
    affected = (F.coalesce(F.col("status"), F.lit("")) != "Not Affected") & (
        F.coalesce(F.col("pkg"), F.lit("")) != ""
    )
    per_entry = live.select(
        "version", "cve_id", "pos",
        ns.alias("ns"),
        cvss_to_severity(F.col("cve_score")).alias("sev"),
        F.when(affected, fixed_in).alias("fi"),
        "advisory_date",
    )
    rec = per_entry.groupBy("version", "cve_id").agg(
        # constant within the (version, cve) group; min() instead of
        # first() so the agg is order-insensitive by construction
        F.min("ns").alias("ns"),
        # first entry (input order) scoring non-Unknown, else Unknown —
        # the scan runs over ALL entries, including non-affected ones
        F.coalesce(
            F.min_by(
                F.when(F.col("sev") != "Unknown", F.col("sev")),
                F.when(F.col("sev") != "Unknown", F.col("pos")),
            ),
            F.lit("Unknown"),
        ).alias("Severity"),
        # FixedIn in input order; non-affected entries contribute null
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("fi").isNotNull(),
                        F.struct(F.col("pos"), F.col("fi").alias("e")),
                    )
                )
            ),
            lambda s: s["e"],
        ).alias("FixedIn"),
        F.max("advisory_date").alias("Issued"),
    )
    return rec.where(F.size("FixedIn") > 0).select(
        F.col("cve_id").alias("Name"),
        F.col("ns").alias("NamespaceName"),
        F.lit("").alias("Description"),
        "Severity",
        reference_link(F.col("cve_id")).alias("Link"),
        F.array().cast("array<string>").alias("CVSS"),
        "FixedIn",
        F.struct(F.col("Issued")).alias("Metadata"),
    )
