"""AlmaLinux OSV post-processing pipeline (SURVEY §2 provider-family
proof).

Reference flow (/root/reference/src/vunnel/providers/alma/parser.py:
16-25 ``_known_library_gaps_``, 68-101 ``_add_missing_library_packages``,
103-136 ``_normalize``, 138-166 ``_parse_modularity_from_summary``):

    OSV advisory records from the AlmaLinux osv-database git checkout
    ->  modularity: the token between the summary's FIRST and SECOND
        space ('Moderate: mariadb:10.3 security update' -> mariadb:10.3)
        when it contains ':' not at either end; written to EVERY
        affected entry's ecosystem_specific.rpm_modularity
    ->  known library gaps: for eight pinned ALSA ids, clone the FIRST
        affected entry of the named base package under the library
        package name — unless the library package is already listed
        (the reference recomputes the name set each append, so a second
        base entry never clones twice)
    ->  database_specific.anchore.record_type = 'advisory'
    ->  key = 'almalinux<version>/<id>', schema_version default '1.7.0'

Gap clones run AFTER the modularity stamp (same order as _normalize),
so a clone inherits the stamped ecosystem_specific.  The reference
mutates dicts in place; here each transform is a Catalyst array
expression over the nested ``affected`` column — no explode/regroup and
no shuffle at all: the whole normalize is row-local and the git-scan
source partitioning passes straight through (the downstream fix-date
patch in pipelines/osv.py is where the one keyed shuffle lives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: alma/parser.py:16-25 — advisory-id -> {base package: library package}
KNOWN_LIBRARY_GAPS = {
    "ALSA-2019:3706": {"lua": "lua-libs"},
    "ALSA-2020:5487": {"pacemaker": "pacemaker-libs"},
    "ALSA-2021:4386": {"gcc": "libgcc"},
    "ALSA-2021:4393": {"cups": "cups-libs"},
    "ALSA-2021:4489": {"rpm-build": "rpm-build-libs"},
    "ALSA-2021:4587": {"gcc": "libgcc"},
    "ALSA-2022:0368": {"rpm-build": "rpm-build-libs"},
    "ALSA-2022:7928": {"device-mapper-multipath": "device-mapper-multipath-libs"},
}


def parse_modularity(summary):
    """Module token between the summary's first and second space, when
    it carries an interior colon (alma/parser.py:138-166).

    ``summary.find`` semantics map exactly onto a single-space split
    that KEEPS empty tokens: element 1 is the text between the first
    two spaces (needs >= 3 elements for the second space to exist).
    """
    toks = F.split(F.coalesce(summary, F.lit("")), " ", -1)
    # the reference's str.strip() removes tabs/newlines too, not just
    # ASCII spaces like F.trim — 'Moderate: \tmod:1 update' must yield
    # 'mod:1', not '\tmod:1' (r11 ADVICE)
    info = F.regexp_replace(toks[1], r"^\s+|\s+$", "")
    return F.when(
        (F.size(toks) >= 3)
        & info.contains(":")
        & ~info.startswith(":")
        & ~info.endswith(":"),
        info,
    )


def _gaps_lit():
    return F.array(
        *[
            F.struct(
                F.lit(vid).alias("vid"),
                F.lit(base).alias("base"),
                F.lit(lib).alias("lib"),
            )
            for vid, gaps in KNOWN_LIBRARY_GAPS.items()
            for base, lib in gaps.items()
        ]
    )


def _with_gap_clones(affected, vuln_id):
    """Append library-package clones for the pinned advisory gaps
    (alma/parser.py:68-101): clone the FIRST base-package entry, skip
    when the library name already appears (incl. a just-added clone —
    the fold re-tests the accumulator each step, exactly like the
    reference's recomputed name set).  A fold over the (tiny, literal)
    gap array keeps the expression linear in the map size; a chained
    when() per gap references its input four times and goes exponential
    in the analyzer."""
    applicable = F.filter(_gaps_lit(), lambda g: g["vid"] == vuln_id)
    return F.aggregate(
        applicable,
        affected,
        lambda acc, g: F.when(
            F.exists(acc, lambda p: p["package"]["name"] == g["lib"]),
            acc,
        ).otherwise(
            F.concat(
                acc,
                F.transform(
                    F.slice(
                        F.filter(
                            acc, lambda p: p["package"]["name"] == g["base"]
                        ),
                        1,
                        1,
                    ),
                    lambda p: p.withField(
                        "package",
                        p["package"].withField("name", g["lib"]),
                    ),
                ),
            )
        ),
    )


def alma_pipeline(advisories: DataFrame) -> DataFrame:
    """advisories(version, id, schema_version, summary, affected
    array<struct<package struct<name, ecosystem>, ecosystem_specific
    struct<rpm_modularity string>, ...>>) -> the normalized records.

    The reference emits (key, schema, mutated-record) tuples; here the
    record stays a typed nested column set: ``key`` =
    almalinux<version>/<id>, ``schema_version`` defaulted, ``affected``
    modularity-stamped then gap-cloned, ``record_type`` the anchore
    advisory marker (a dedicated column standing in for the reference's
    open-ended database_specific.anchore dict)."""
    modularity = parse_modularity(F.col("summary"))
    stamped = F.when(
        modularity.isNotNull(),
        F.transform(
            F.col("affected"),
            lambda p: p.withField(
                "ecosystem_specific",
                F.struct(modularity.alias("rpm_modularity")),
            ),
        ),
    ).otherwise(F.col("affected"))
    return advisories.select(
        F.concat(
            F.lit("almalinux"), F.col("version"), F.lit("/"), F.col("id")
        ).alias("key"),
        "id",
        F.coalesce(F.col("schema_version"), F.lit("1.7.0")).alias(
            "schema_version"
        ),
        "summary",
        _with_gap_clones(stamped, F.col("id")).alias("affected"),
        F.lit("advisory").alias("record_type"),
    )
