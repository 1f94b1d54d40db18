"""Arch Linux AVG-record pipeline (SURVEY §2 provider-family proof).

Reference flow (/root/reference/src/vunnel/providers/arch/parser.py:
248-302 ``parse``, 168-226 ``_build_fixed_in_entries``, 131-135
``_get_best_asa_date``, 24-29 ``SEVERITY_MAPPING``):

    scan all.json (one AVG group per record)
    ->  drop empty group ids and 'Not affected' records
    ->  severity normalization (identity on the four tiers, else Unknown)
    ->  best ASA date: min advisory date over the record's ASA ids,
        looked up against the prefetched ASA date cache (failed fetches
        are None and fall out of the min)
    ->  explode packages (skip empty names)  ->  one FixedIn per package:
        pacman version format, Version='None' when unfixed, fix
        availability only when fixed and an ASA date was found
    ->  Description falls back to 'Arch vulnerability <AVG>' when the
        record's type is empty; record key is the lowercased AVG id

The reference resolves ASA dates by threaded HTTP prefetch into a dict;
here the cache is a DataFrame dimension (asa_id, date) — the explode +
broadcast-join + min-agg expresses the same "earliest advisory date"
rule as one thin shuffle of (group_id, date) pairs.  At 100 TB the ASA
dimension stays broadcast-sized (it is bounded by the advisory
namespace, not the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: reference SEVERITY_MAPPING (arch/parser.py:24-29) — identity on the
#: four tiers, everything else (empty, bogus) normalizes to Unknown.
SEVERITY_TIERS = ("Critical", "High", "Medium", "Low")


def normalize_severity(col):
    return F.when(col.isin(*SEVERITY_TIERS), col).otherwise(F.lit("Unknown"))


def best_asa_dates(records: DataFrame, asa_dates: DataFrame) -> DataFrame:
    """(group_id, asa_date): earliest known advisory date per FIXED
    record (arch/parser.py:131-135 — unfixed records never look up a
    date; cache misses/failed fetches are null and drop out)."""
    fixed = records.filter(F.col("fixed_version") != "")
    return (
        fixed.select("group_id", F.explode("advisories").alias("asa_id"))
        .join(
            F.broadcast(asa_dates.filter(F.col("date").isNotNull())), "asa_id"
        )
        .groupBy("group_id")
        .agg(F.min("date").alias("asa_date"))
    )


def arch_pipeline(records: DataFrame, asa_dates: DataFrame) -> DataFrame:
    """records(group_id, status, packages, fixed_version, severity,
    vuln_type, issues, advisories) + asa_dates(asa_id, date) ->
    one FixedIn row per (record, package).

    The reference STRIPS every scalar it reads (parse(), parser.py:
    255-275: name/status/fixed/severity/type all .strip() after a
    falsy-default .get) — so ' Not affected ' still skips, a
    whitespace-only fixed version is UNFIXED, and a padded severity
    still maps; a missing status is the empty string and the record is
    KEPT (r12 fidelity pass: the old un-stripped != test also dropped
    null-status records, which the reference keeps)."""
    live = (
        records.withColumn("group_id", F.trim(F.coalesce("group_id", F.lit(""))))
        .withColumn(
            "fixed_version", F.trim(F.coalesce("fixed_version", F.lit("")))
        )
        .withColumn("severity", F.trim(F.coalesce("severity", F.lit(""))))
        .withColumn("vuln_type", F.trim(F.coalesce("vuln_type", F.lit(""))))
        .filter(
            (F.col("group_id") != "")
            & (F.trim(F.coalesce("status", F.lit(""))) != "Not affected")
        )
    )
    dates = best_asa_dates(live, asa_dates)
    fixed = F.col("fixed_version") != ""
    per_pkg = (
        live.join(dates, "group_id", "left")
        .select(
            "*",
            F.explode("packages").alias("package"),
        )
        .filter(F.col("package") != "")
    )
    return per_pkg.select(
        F.lower(F.col("group_id")).alias("record_id"),
        F.col("package").alias("name"),
        F.lit("arch:rolling").alias("namespace"),
        F.lit("pacman").alias("version_format"),
        F.when(fixed, F.col("fixed_version")).otherwise(F.lit("None")).alias(
            "version"
        ),
        normalize_severity(F.col("severity")).alias("severity"),
        F.when(F.col("vuln_type") != "", F.col("vuln_type"))
        .otherwise(F.concat(F.lit("Arch vulnerability "), F.col("group_id")))
        .alias("description"),
        F.concat(F.lit("https://security.archlinux.org/"), F.col("group_id"))
        .alias("link"),
        # fix-date lookup key: first CVE if any, else the AVG id
        # (arch/parser.py:190-192)
        F.when(F.size("issues") > 0, F.element_at("issues", 1))
        .otherwise(F.col("group_id"))
        .alias("fix_lookup_id"),
        F.when(fixed, F.col("asa_date")).alias("available_date"),
        F.size("issues").cast("int").alias("n_cves"),
    )
