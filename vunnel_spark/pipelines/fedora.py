"""Fedora (Bodhi security-update) pipeline (SURVEY §2 provider-family proof).

Reference flow (/root/reference/src/vunnel/providers/fedora/parser.py:
209-234 ``_extract_cves``, 236-254 ``_parse_builds``, 256-282
``_parse_update``, 284-370 ``_normalize``, 398-413 ``get``):

    load FEDORA-<alias>.json updates (sorted by filename = by alias)
    ->  drop updates with no alias or a non-numeric release version
    ->  severity: lowercased Bodhi tier through SEVERITY_MAP, unknown
        tiers (and empty) -> Unknown
    ->  CVE ids: regex over SECURITY bug titles first (unique, first
        occurrence order); only when none, fall back to display_name
        then title with the same shared seen-set
    ->  packages: rpm builds only, NVR rsplit('-', 2) -> name +
        '<epoch or 0>:<version>-<release>'; malformed NVRs skipped;
        an advisory with no packages yields nothing
    ->  one record per CVE (or per advisory alias when no CVEs), each
        FixedIn carrying the advisory's VendorAdvisory summary and an
        optional fixdate Available (finder hit wins, else the
        date_stable advisory candidate — parser.py:326-337)
    ->  cross-update merge keyed by (namespace, vuln id): the FIRST
        update (alias order) establishes the record, later updates only
        EXTEND FixedIn (get, parser.py:403-411)

The reference's per-file imperative walk is restated as nested-array
Catalyst expressions (regexp_extract_all + array_distinct preserves the
seen-set's first-occurrence order; the NVR rsplit is one anchored
regex), a posexplode over packages x CVEs, and one groupBy per vuln key
whose min_by(alias) picks the record-establishing update and whose
sort_array(collect_list(struct(alias, pos, entry))) restates the
append-in-update-order FixedIn merge.  The fixdate dimension joins
broadcast (bounded by the advisory namespace, not the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Bodhi -> engine severity tiers (fedora/parser.py:26-37); unmapped and
#: empty values normalize to Unknown via the when-chain's otherwise.
SEVERITY_MAP = {
    "urgent": "Critical",
    "critical": "Critical",
    "important": "High",
    "high": "High",
    "moderate": "Medium",
    "medium": "Medium",
    "low": "Low",
}

_CVE_RE = r"CVE-\d{4}-\d+"
#: rsplit('-', 2) semantics (fedora/parser.py:247-249): the reference
#: only drops when there are fewer than two hyphens — empty version or
#: release segments ('a--b', 'a-b-') are KEPT, so the segment groups
#: must admit empty ([^-]*, not [^-]+)
_NVR_RE = r"^(.*)-([^-]*)-([^-]*)$"


def map_severity(col):
    out = None
    for src, dst in SEVERITY_MAP.items():
        cond = F.lower(col) == src
        out = F.when(cond, dst) if out is None else out.when(cond, dst)
    return out.otherwise(F.lit("Unknown"))


def extract_cves(bugs, display_name, title):
    """Unique CVE ids in first-occurrence order: security-bug titles
    first; ONLY if that yields none, display_name then title with one
    shared seen-set (fedora/parser.py:209-234 — array_distinct keeps the
    first occurrence, which is exactly the imperative seen-set order).

    r15 form: ONE regex scan per source instead of one per array
    element — security titles join on '\\n' (a CVE id is [-\\dA-Z]-only,
    so no match can span the separator, and match order over the joined
    string IS flatten's element order; concat_ws also skips NULL titles
    exactly like the old per-element coalesce('')).  The per-element
    ``regexp_extract_all`` lambdas ran interpreted inside HOF eval —
    this pipeline's largest per-row cost (guide §7.4)."""
    sec_titles = F.concat_ws(
        "\n", F.transform(F.filter(bugs, lambda b: b["security"]), lambda b: b["title"])
    )
    from_bugs = F.array_distinct(
        F.regexp_extract_all(sec_titles, F.lit(_CVE_RE), F.lit(0))
    )
    fallback = F.array_distinct(
        F.regexp_extract_all(
            F.concat_ws(
                "\n",
                F.coalesce(display_name, F.lit("")),
                F.coalesce(title, F.lit("")),
            ),
            F.lit(_CVE_RE),
            F.lit(0),
        )
    )
    return F.when(F.size(from_bugs) > 0, from_bugs).otherwise(fallback)


def parse_builds(builds):
    """rpm builds -> (name, 'epoch:version-release') structs; non-rpm
    and malformed NVRs (fewer than two hyphens) drop
    (fedora/parser.py:236-254).

    r15 form: the NVR rsplit is ONE ``split('-')`` per element instead
    of an rlike plus three ``regexp_extract`` scans.  ``_NVR_RE``
    (``^(.*)-([^-]*)-([^-]*)$``, greedy head) matches exactly the
    strings with >= 2 hyphens and captures (join of all but the last
    two segments, 2nd-last segment, last segment) — precisely the
    split/slice form (the equivalence cases incl. empty segments are
    pinned in tests/test_fedora_pipeline.py).  One transform computing
    the split once per element + a null filter replaces the
    filter-then-transform pair that re-parsed every element."""
    def _entry(b):
        parts = F.split(F.coalesce(b["nvr"], F.lit("")), "-")
        n = F.size(parts)
        return F.when(
            (b["type"] == "rpm") & (n >= 3),
            F.struct(
                F.array_join(F.slice(parts, F.lit(1), n - 2), "-").alias(
                    "name"
                ),
                F.concat(
                    F.coalesce(b["epoch"], F.lit(0)).cast("string"),
                    F.lit(":"),
                    F.element_at(parts, -2),
                    F.lit("-"),
                    F.element_at(parts, -1),
                ).alias("version"),
            ),
        )

    return F.filter(
        F.transform(builds, _entry), lambda s: s.isNotNull()
    )


def fedora_pipeline(updates: DataFrame, fixdates: DataFrame | None = None) -> DataFrame:
    """updates(alias, release_version, severity, display_name, title,
    notes, date_submitted, date_modified, date_stable, url,
    bugs array<struct<security boolean, title string>>,
    builds array<struct<type string, nvr string, epoch int>>)
    -> one merged vulnerability row per (namespace, vuln id).

    ``fixdates`` is the optional finder dimension (vuln_id, package,
    fix_version, ecosystem, date, kind); a finder hit overrides the
    advisory's date_stable candidate (parser.py:326-337 passes
    date_stable as a candidate and fixdate.best prefers its own
    accurate records — the J9/W1 priority discipline)."""
    live = updates.filter(
        F.col("alias").isNotNull()
        & (F.col("alias") != "")
        & F.coalesce(F.col("release_version"), F.lit("")).rlike(r"^\d+$")
    ).select(
        "alias",
        F.concat(F.lit("fedora:"), F.col("release_version")).alias("ns"),
        map_severity(F.col("severity")).alias("sev"),
        F.coalesce(F.col("display_name"), F.col("alias")).alias("title_out"),
        F.coalesce(F.col("date_submitted"), F.lit("")).alias("issued"),
        F.coalesce(
            F.when(F.col("date_modified") != "", F.col("date_modified")),
            F.when(F.col("date_stable") != "", F.col("date_stable")),
            F.lit(""),
        ).alias("updated"),
        F.col("date_stable"),
        F.coalesce(
            F.col("url"),
            F.concat(
                F.lit("https://bodhi.fedoraproject.org/updates/"), F.col("alias")
            ),
        ).alias("link"),
        extract_cves(F.col("bugs"), F.col("display_name"), F.col("title")).alias(
            "cves"
        ),
        parse_builds(F.col("builds")).alias("packages"),
    )
    live = live.filter(F.size("packages") > 0)
    # vuln ids: the CVE list, or the advisory alias when no CVEs
    vulns = live.withColumn(
        "vuln_ids",
        F.when(F.size("cves") > 0, F.col("cves")).otherwise(F.array(F.col("alias"))),
    ).withColumn("lookup_id", F.col("vuln_ids")[0])
    pkgs = vulns.select(
        "*", F.posexplode("packages").alias("pkg_pos", "pkg")
    )
    if fixdates is not None:
        dim = fixdates.filter(F.col("date").isNotNull()).select(
            F.col("vuln_id").alias("lookup_id"),
            F.col("package").alias("_p"),
            F.col("fix_version").alias("_v"),
            F.col("ecosystem").alias("_ns"),
            F.col("date").alias("_fd_date"),
            F.col("kind").alias("_fd_kind"),
        )
        pkgs = pkgs.join(
            F.broadcast(dim),
            (pkgs["lookup_id"] == dim["lookup_id"])
            & (pkgs["pkg"]["name"] == dim["_p"])
            & (pkgs["pkg"]["version"] == dim["_v"])
            & (pkgs["ns"] == dim["_ns"]),
            "left",
        ).drop(dim.lookup_id)
    else:
        pkgs = pkgs.withColumn("_fd_date", F.lit(None).cast("string")).withColumn(
            "_fd_kind", F.lit(None).cast("string")
        )
    entry = F.struct(
        F.col("pkg.name").alias("Name"),
        F.col("pkg.version").alias("Version"),
        F.lit("rpm").alias("VersionFormat"),
        F.col("ns").alias("NamespaceName"),
        F.struct(
            F.lit(False).alias("NoAdvisory"),
            F.array(
                F.struct(F.col("alias").alias("ID"), F.col("link").alias("Link"))
            ).alias("AdvisorySummary"),
        ).alias("VendorAdvisory"),
        # fixdate.best with an accurate 'advisory' candidate
        # (parser.py:296-304 + finder.py:137-203): the candidate ranks
        # FIRST unless an accurate first-observed store date is strictly
        # EARLIER — i.e. the earliest (Date, Kind) wins, the 'advisory'
        # kind breaking equal-date ties exactly like best()'s
        # d_adv <= d_first_observed test.  (The dim models the finder's
        # accurate first-observed records; an unconditional finder-wins
        # rule — the pre-r12 shape — inverted the pick whenever the
        # store date was later than date_stable.)
        F.least(
            F.when(
                F.col("_fd_date").isNotNull(),
                F.struct(
                    F.col("_fd_date").alias("Date"),
                    F.col("_fd_kind").alias("Kind"),
                ),
            ),
            F.when(
                F.coalesce(F.col("date_stable"), F.lit("")) != "",
                F.struct(
                    F.col("date_stable").alias("Date"),
                    F.lit("advisory").alias("Kind"),
                ),
            ),
        ).alias("Available"),
    )
    per_vuln = pkgs.select(
        "alias", "ns", "sev", "link", "issued", "updated", "pkg_pos",
        entry.alias("fixed_in"),
        F.explode("vuln_ids").alias("vuln_id"),
    )
    # cross-update merge: first update (alias order) establishes the
    # record; every update's FixedIn appends in (alias, build) order
    return (
        per_vuln.groupBy("ns", "vuln_id")
        .agg(
            F.min_by(
                F.struct("sev", "link", "issued", "updated"), F.col("alias")
            ).alias("head"),
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("alias", "pkg_pos", F.col("fixed_in").alias("e"))
                    )
                ),
                lambda s: s["e"],
            ).alias("FixedIn"),
        )
        .select(
            F.col("vuln_id").alias("Name"),
            F.col("ns").alias("NamespaceName"),
            F.col("head.sev").alias("Severity"),
            F.col("head.link").alias("Link"),
            F.col("head.issued").alias("Issued"),
            F.col("head.updated").alias("Updated"),
            F.when(
                F.col("vuln_id").rlike(r"^CVE-"),
                F.array(
                    F.struct(
                        F.col("vuln_id").alias("Name"),
                        F.concat(
                            F.lit("https://nvd.nist.gov/vuln/detail/"),
                            F.col("vuln_id"),
                        ).alias("Link"),
                    )
                ),
            )
            .otherwise(F.array().cast("array<struct<Name:string,Link:string>>"))
            .alias("CVE"),
            "FixedIn",
        )
    )
