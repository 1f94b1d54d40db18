"""Additional provider-pipeline DAG queries (tail module — keeps the
pinned gate window stable; the first eight provider DAGs live in
pipelines_q inside the window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vunnel_spark.queries._util import t
from vunnel_spark.registry import register


@register(
    "secdb1_end_to_end_dag",
    """
    WITH fixes AS (
      SELECT 'alp' || CAST(o_custkey % 2 AS VARCHAR) AS distro,
             'pkg' || CAST(o_orderkey % 40 AS VARCHAR) AS name,
             '1.' || CAST(o_orderkey % 5 AS VARCHAR) AS version,
             'CVE-2024-' || CAST(o_orderkey % 300 AS VARCHAR) AS vid,
             o_orderkey % 13 = 0 AS rej
      FROM orders
    ), rejected_pairs AS (
      SELECT DISTINCT name, vid FROM fixes WHERE rej
    )
    SELECT DISTINCT f.distro, f.vid, f.name, f.version
    FROM fixes f
    WHERE NOT EXISTS (SELECT 1 FROM rejected_pairs r
                      WHERE r.name = f.name AND r.vid = f.vid)
    """,
    doc="Alpine/wolfi secdb provider DAG end-to-end "
        "(pipelines/secdb.py; reference wolfi/parser.py:153-255, "
        "alpine/parser.py:193-313): nested secdb docs synthesized from "
        "orders -> multi-level explode with multi-id split -> CVE-pattern "
        "filter (a non-CVE noise id is planted per row and must vanish) "
        "-> rejection anti-join (J5) -> sorted FixedIn assembly, exploded "
        "back flat so the oracle states the exact expected artifact table",
    tags=("pipeline", "explode", "filter"),
)
def secdb1(spark, sf_dir):
    from vunnel_spark.pipelines.secdb import (
        apply_rejections,
        assemble_records,
        cve_filter,
        explode_fixes,
    )

    o = t(spark, sf_dir, "orders")
    vid = F.concat(F.lit("CVE-2024-"), (F.col("o_orderkey") % 300).cast("string"))
    noise = F.concat(F.lit("XRB-"), (F.col("o_orderkey") % 7).cast("string"))
    db = o.select(
        F.concat(F.lit("alp"), (F.col("o_custkey") % 2).cast("string")).alias(
            "distro"
        ),
        F.array(
            F.struct(
                F.struct(
                    F.concat(
                        F.lit("pkg"), (F.col("o_orderkey") % 40).cast("string")
                    ).alias("name"),
                    F.array(
                        F.struct(
                            F.concat(
                                F.lit("1."),
                                (F.col("o_orderkey") % 5).cast("string"),
                            ).alias("version"),
                            # one string carrying BOTH ids: exercises the
                            # whitespace split + the CVE-pattern filter
                            F.array(F.concat_ws(" ", vid, noise)).alias("ids"),
                        )
                    ).alias("secfixes"),
                ).alias("pkg")
            )
        ).alias("packages"),
    )
    fixes = cve_filter(explode_fixes(db))
    rejections = (
        o.filter(F.col("o_orderkey") % 13 == 0)
        .select(
            F.concat(F.lit("pkg"), (F.col("o_orderkey") % 40).cast("string")).alias(
                "pkg"
            ),
            vid.alias("vid"),
        )
        .distinct()
    )
    records = assemble_records(apply_rejections(fixes, rejections))
    return records.select(
        "distro", "vid", F.explode("FixedIn").alias("f")
    ).select(
        "distro", "vid", F.col("f.Name").alias("name"), F.col("f.Version").alias("version")
    ).distinct()


@register(
    "alas1_end_to_end_dag",
    """
    WITH pkgs AS (
      SELECT p_partkey % 100 AS page_id,
             'pkg' || CAST(p_partkey AS VARCHAR) || '-'
                   || CAST(p_size AS VARCHAR) || '.1-1.amzn2' AS pkg
      FROM part WHERE p_partkey % 3 <> 1
    ), rss AS (
      SELECT DISTINCT p_partkey % 100 AS page_id,
             CASE p_partkey % 100 % 4 WHEN 0 THEN 'critical' WHEN 1 THEN 'important'
                  WHEN 2 THEN 'medium' ELSE 'low' END AS rss_sev
      FROM part
    )
    SELECT 'ALAS-2026-' || CAST(k.page_id AS VARCHAR) AS alas_id,
           CASE r.rss_sev WHEN 'critical' THEN 'Critical' WHEN 'important' THEN 'High'
                WHEN 'medium' THEN 'Medium' ELSE 'Low' END AS severity,
           'Overview for page ' || CAST(k.page_id AS VARCHAR) AS description,
           string_agg(DISTINCT k.pkg, '|' ORDER BY k.pkg) AS fixed_csv
    FROM pkgs k JOIN rss r ON k.page_id = r.page_id
    GROUP BY k.page_id, r.rss_sev
    """,
    doc="Amazon ALAS provider DAG end-to-end (reference providers/amazon/"
        "parser.py:80-331): RSS inventory (severity per ALAS, synthesized) "
        "joined to the HTML fixed-package extraction (F7's real stateful "
        "parser over synthesized pages), severity normalized "
        "(rss->Critical/High/Medium/Low per amazon/parser.py severity map), "
        "deterministically sorted FixedIn folded per advisory — the full "
        "scan->parse->join->normalize->assemble provider shape with an "
        "exact SQL oracle",
    tags=("pipeline", "parse", "join"),
)
def alas1(spark, sf_dir):
    from vunnel_spark.functions.html import extract_alas_packages
    from vunnel_spark.queries.html_q import _alas_pages

    ex = extract_alas_packages(_alas_pages(spark, sf_dir))
    part = t(spark, sf_dir, "part")
    rss = part.select(
        (F.col("p_partkey") % 100).alias("page_id"),
        F.element_at(
            F.array(F.lit("critical"), F.lit("important"), F.lit("medium"), F.lit("low")),
            ((F.col("p_partkey") % 100 % 4) + 1).cast("int"),
        ).alias("rss_sev"),
    ).distinct()
    sev_norm = (
        F.when(F.col("rss_sev") == "critical", "Critical")
        .when(F.col("rss_sev") == "important", "High")
        .when(F.col("rss_sev") == "medium", "Medium")
        .otherwise("Low")
    )
    return (
        ex.join(F.broadcast(rss), "page_id")
        .groupBy("page_id", "rss_sev")
        .agg(
            F.first("overview").alias("description"),
            F.array_join(F.array_sort(F.collect_set("pkg")), "|").alias("fixed_csv"),
        )
        .select(
            F.concat(F.lit("ALAS-2026-"), F.col("page_id").cast("string")).alias(
                "alas_id"
            ),
            sev_norm.alias("severity"),
            "description",
            "fixed_csv",
        )
    )
