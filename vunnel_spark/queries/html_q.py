"""HTML fixed-package extraction query (SURVEY F7 / S6 — Amazon ALAS).

The reference scrapes per-ALAS HTML pages and walks them with a stateful
``HTMLParser`` to pull fixed-package filenames out of the ``new_packages``
element (``/root/reference/src/vunnel/providers/amazon/parser.py:199-207,
276-331``).  Here the HTML pages are synthesized deterministically from the
``part`` table (the container has no network), the extraction runs through
the real mapInPandas state machine (functions/html.py), and the oracle
computes the expected rows directly from ``part`` — so the gate verifies
the parser semantics end-to-end, including the irrelevant-arch (``i686:``)
skip rule.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vunnel_spark.queries._util import t
from vunnel_spark.registry import register


def _alas_pages(spark, sf_dir):
    """One synthetic ALAS HTML page per ``p_partkey % 100`` bucket.

    Every part contributes one package filename to its page, placed under
    ``x86_64:`` (partkey % 3 == 0), ``i686:`` (== 1, must be SKIPPED by the
    parser — not a relevant arch), or ``src:`` (== 2).  Sections and
    packages are sorted so the page bytes are deterministic.
    """
    part = t(spark, sf_dir, "part").select("p_partkey", "p_size")
    entries = part.select(
        (F.col("p_partkey") % 100).alias("page_id"),
        F.when(F.col("p_partkey") % 3 == 0, F.lit("x86_64:"))
        .when(F.col("p_partkey") % 3 == 1, F.lit("i686:"))
        .otherwise(F.lit("src:"))
        .alias("section"),
        # realistic ALAS filename shape: name-ver-rel.amzn2.ARCH, with
        # an epoch prefix on every 5th package (split_rpm_filename
        # strips the arch and get_package_name_version drops the epoch)
        F.concat(
            F.when(F.col("p_partkey") % 5 == 0, F.lit("1:")).otherwise(F.lit("")),
            F.lit("pkg"),
            F.col("p_partkey").cast("string"),
            F.lit("-"),
            F.col("p_size").cast("string"),
            F.lit(".1-1.amzn2."),
            F.when(F.col("p_partkey") % 3 == 0, F.lit("x86_64"))
            .when(F.col("p_partkey") % 3 == 1, F.lit("i686"))
            .otherwise(F.lit("src")),
        ).alias("pkg"),
    )
    sections = entries.groupBy("page_id", "section").agg(
        F.array_sort(F.collect_list("pkg")).alias("pkgs")
    )
    sec_html = F.concat(
        F.lit("<span>"),
        F.col("section"),
        F.lit("</span>"),
        F.concat_ws(
            "",
            F.transform(
                F.col("pkgs"), lambda p: F.concat(F.lit("<span>"), p, F.lit("</span>"))
            ),
        ),
    )
    return (
        sections.select("page_id", F.struct(F.col("section"), sec_html.alias("h")).alias("s"))
        .groupBy("page_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list("s")), lambda s: s["h"])
            ).alias("body")
        )
        .select(
            "page_id",
            F.concat(
                F.lit('<html><body><div id="issue_overview"><p>Issue Overview:</p><p>'),
                F.lit("Overview for page "),
                F.col("page_id").cast("string"),
                F.lit('</p></div><div id="new_packages">'),
                F.col("body"),
                F.lit("</div></body></html>"),
            ).alias("html"),
        )
    )


@register(
    "f7_alas_html_extract",
    """
    SELECT p_partkey % 100 AS page_id,
           CASE WHEN p_partkey % 3 = 0 THEN 'x86_64' ELSE 'src' END AS arch,
           CASE WHEN p_partkey % 5 = 0 THEN '1:' ELSE '' END ||
             'pkg' || CAST(p_partkey AS VARCHAR) || '-'
                 || CAST(p_size AS VARCHAR) || '.1-1.amzn2.'
                 || CASE WHEN p_partkey % 3 = 0 THEN 'x86_64' ELSE 'src' END
             AS pkg,
           -- get_package_name_version: arch stripped, epoch dropped
           'pkg' || CAST(p_partkey AS VARCHAR) AS name,
           CAST(p_size AS VARCHAR) || '.1-1.amzn2' AS version,
           'Overview for page ' || CAST(p_partkey % 100 AS VARCHAR) AS overview
    FROM part
    WHERE p_partkey % 3 <> 1
    """,
    doc="ALAS HTML fixed-package extraction (functions/html.py; reference "
        "providers/amazon/parser.py:276-331): stateful HTMLParser walk as a "
        "mapInPandas stage — pages synthesized from part with REALISTIC "
        "arch-suffixed, optionally epoch-prefixed rpm filenames; oracle "
        "computes expected rows directly, so the i686-skip state machine "
        "AND the exact get_package_name_version split (parser.py:149-161 "
        "over split_rpm_filename — '.rpm' append, arch strip, rsplit-2, "
        "epoch drop) are verified end to end",
    tags=("parse", "sources"),
)
def f7(spark, sf_dir):
    from vunnel_spark.functions.html import alas_name_version, extract_alas_packages

    ex = extract_alas_packages(_alas_pages(spark, sf_dir))
    nv = alas_name_version(F.col("pkg"))
    return ex.select(
        "page_id",
        "arch",
        "pkg",
        nv["name"].alias("name"),
        nv["version"].alias("version"),
        "overview",
    )
