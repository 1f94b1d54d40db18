"""Echo Linux advisory pipeline (SURVEY §2 provider-family proof).

Reference flow (/root/reference/src/vunnel/providers/echo/parser.py:
77-132 ``_normalize``, 134-144 ``get``; utils/vulnerability.py:149-159
``build_reference_links``):

    scan data.json ({package: {cve_id: {severity, fixed_version}}})
    ->  skip Debian TEMP-* placeholder ids (parser.py:89-92)
    ->  one record per CVE id, created on FIRST encounter in input
        order: Name, NamespaceName '<ns>:rolling', Link = first
        reference link (cve.org for CVE-*, github for GHSA-*, '' when
        the id has no link form), Severity = severity of that FIRST
        (package, cve) entry or 'Unknown' (later packages never update
        it — parser.py:93-100 only populates the dict on miss)
    ->  one FixedIn per (package, cve) appended in input order:
        dpkg format, Version = fixed_version or '', optional
        Available{Date, Kind} from the fixdate finder (parser.py:102-129)

The reference builds the record dict imperatively while iterating the
JSON; here the same semantics are one groupBy(cve_id): first-encounter
fields via min_by(struct(pos, ...)), FixedIn order via
sort_array(collect_list(struct(pos, entry))).  The fixdate lookup —
``fixdater.best(vuln_id, package, fix_version, ecosystem)`` — becomes a
broadcast left join against the finder dimension keyed the same way
(the dimension is bounded by the advisory namespace, not the corpus, so
it stays broadcast-sized at 100 TB; the fact table shuffles once, on
cve_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def reference_link(col):
    """First entry of build_reference_links (vulnerability.py:149-159);
    '' when the helper returns None (parser.py:97)."""
    return (
        F.when(
            col.startswith("CVE-"),
            F.concat(F.lit("https://www.cve.org/CVERecord?id="), col),
        )
        .when(
            col.startswith("GHSA-"),
            F.concat(F.lit("https://github.com/advisories/"), col),
        )
        .otherwise(F.lit(""))
    )


def echo_pipeline(
    advisories: DataFrame,
    namespace: str = "echo",
    release: str = "rolling",
    fixdates: DataFrame | None = None,
) -> DataFrame:
    """advisories(pos, package, cve_id, severity, fixed_version) ->
    one vulnerability record per surviving CVE id.

    ``pos`` is the entry's position in the source JSON's iteration
    order (package-major, as parser.py:88-89 walks it) — it drives both
    the first-encounter severity pick and the FixedIn append order.
    ``fixdates`` is the optional finder dimension
    (vuln_id, package, fix_version, date, kind); a (cve, package,
    version) entry gains Available{Date, Kind} when the finder knows a
    date (parser.py:116-129).
    """
    ns = f"{namespace}:{release}"
    live = advisories.filter(~F.col("cve_id").startswith("TEMP-")).select(
        "pos",
        "package",
        "cve_id",
        "severity",
        F.coalesce(F.col("fixed_version"), F.lit("")).alias("version"),
    )
    if fixdates is None:
        live = live.withColumn("date", F.lit(None).cast("string")).withColumn(
            "kind", F.lit(None).cast("string")
        )
    else:
        dim = fixdates.filter(F.col("date").isNotNull()).select(
            F.col("vuln_id").alias("cve_id"),
            "package",
            F.coalesce(F.col("fix_version"), F.lit("")).alias("version"),
            "date",
            "kind",
        )
        live = live.join(
            F.broadcast(dim), ["cve_id", "package", "version"], "left"
        )
    entry = F.struct(
        F.col("package").alias("Name"),
        F.col("version").alias("Version"),
        F.lit("dpkg").alias("VersionFormat"),
        F.lit(ns).alias("NamespaceName"),
        # fixdate.best refuses falsy/'None'/'0' fix versions outright
        # (finder.py:149-151) — an empty fixed_version never gains an
        # Available even when the store has a matching key (r12
        # fidelity pass)
        F.when(
            F.col("date").isNotNull()
            & ~F.col("version").isin("", "None", "0"),
            F.struct(F.col("date").alias("Date"), F.col("kind").alias("Kind")),
        ).alias("Available"),
    )
    return (
        live.groupBy("cve_id")
        .agg(
            # record created on FIRST encounter: that entry's severity
            # (or Unknown) sticks, later packages never update it
            F.min_by(
                F.coalesce(F.col("severity"), F.lit("Unknown")), F.col("pos")
            ).alias("Severity"),
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("pos"), entry.alias("e")))
                ),
                lambda s: s["e"],
            ).alias("FixedIn"),
        )
        .select(
            F.col("cve_id").alias("Name"),
            F.lit(ns).alias("NamespaceName"),
            reference_link(F.col("cve_id")).alias("Link"),
            "Severity",
            "FixedIn",
        )
    )
