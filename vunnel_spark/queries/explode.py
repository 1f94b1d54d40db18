"""Parsing / explode / restructure operators (SURVEY §2.3 E1-E16).

The reference's "flatMap layer": nested documents to flat rows.  Here the
nesting is synthesized from the flat driver tables (split/struct-build),
then exploded back — exercising explode, posexplode, multi-level explode,
JSON extraction, and regex field splitting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vunnel_spark.queries._util import t
from vunnel_spark.registry import register


@register(
    "e1_explode_words",
    """
    SELECT lang, word, count(*) AS n
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY lang, word
    """,
    doc="E1 unwrap-array explode (nvd/manager.py:232-253 page->CVE rows)",
    tags=("explode",),
)
def e1(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "e2_posexplode_tokens",
    """
    SELECT p_partkey, CAST(g.i AS INT) AS pos, w[g.i] AS word
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part) tt,
         LATERAL (SELECT unnest(generate_series(1, len(tt.w))) AS i) g
    """,
    doc="E2 secdb nested explode with position (wolfi/parser.py:202-255)",
    tags=("explode",),
)
def e2(spark, sf_dir):
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos0", "word")
    ).select("p_partkey", (F.col("pos0") + 1).cast("int").alias("pos"), "word")


@register(
    "e6_evr_split",
    """
    SELECT p_partkey, evr,
           regexp_extract(evr, '^(\\d+):', 1)          AS epoch,
           regexp_extract(evr, ':([0-9.]+)-', 1)       AS version,
           regexp_extract(evr, '-([0-9.]+)$', 1)       AS rel
    FROM (SELECT p_partkey,
                 CAST(p_size % 3 AS VARCHAR) || ':' ||
                 CAST(p_size AS VARCHAR) || '.' || CAST(p_partkey % 10 AS VARCHAR) ||
                 '-' || CAST(p_partkey % 5 AS VARCHAR) AS evr
          FROM part)
    """,
    doc="E6 rpm EVR epoch:version-release regex split (utils/rpm.py:18-87)",
    tags=("explode", "scalar"),
)
def e6(spark, sf_dir):
    part = t(spark, sf_dir, "part").withColumn(
        "evr",
        F.concat_ws(
            "",
            (F.col("p_size") % 3).cast("string"),
            F.lit(":"),
            F.col("p_size").cast("string"),
            F.lit("."),
            (F.col("p_partkey") % 10).cast("string"),
            F.lit("-"),
            (F.col("p_partkey") % 5).cast("string"),
        ),
    )
    return part.select(
        "p_partkey",
        "evr",
        F.regexp_extract("evr", r"^(\d+):", 1).alias("epoch"),
        F.regexp_extract("evr", r":([0-9.]+)-", 1).alias("version"),
        F.regexp_extract("evr", r"-([0-9.]+)$", 1).alias("rel"),
    )


@register(
    "e8_slice_regroup",
    """
    SELECT o_custkey AS custkey, o_orderstatus AS status,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_custkey, o_orderstatus
    """,
    doc="E8 OSV slice-by-ecosystem: explode + regroup by sub-key (ubuntu/parser.py:161-180)",
    tags=("explode", "agg"),
)
def e8(spark, sf_dir):
    # reference semantics: one record -> per-ecosystem sub-records; here:
    # orders regrouped per (customer, status) "slice"
    return (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("custkey"), F.col("o_orderstatus").alias("status")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "e12_nested_restructure",
    """
    SELECT c_custkey,
           c_name  AS vuln_name,
           n_name  AS namespace,
           CASE WHEN c_acctbal < 0 THEN 'Negligible'
                WHEN c_acctbal < 5000 THEN 'Low'
                ELSE 'Medium' END AS severity
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
    doc="E12 OSV->OS downconvert: nested struct build + field re-projection "
        "(ubuntu/os_downconvert.py) — struct built then flattened for output",
    tags=("explode",),
)
def e12(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    nested = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            F.struct(
                F.col("c_name").alias("Name"),
                F.col("n_name").alias("NamespaceName"),
                F.when(F.col("c_acctbal") < 0, "Negligible")
                .when(F.col("c_acctbal") < 5000, "Low")
                .otherwise("Medium")
                .alias("Severity"),
            ).alias("Vulnerability"),
        )
    )
    return nested.select(
        "c_custkey",
        F.col("Vulnerability.Name").alias("vuln_name"),
        F.col("Vulnerability.NamespaceName").alias("namespace"),
        F.col("Vulnerability.Severity").alias("severity"),
    )


@register(
    "e16_json_extract",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
    doc="E16 KEV catalog explode + JSON field extraction (kev/manager.py:38-41)",
    tags=("explode", "scalar"),
)
def e16(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
    )
