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


@register(
    "e10_purl_parse",
    """
    SELECT p_partkey, purl,
           regexp_extract(purl, '^pkg:([^/]+)/', 1) AS ptype,
           regexp_extract(purl, '^pkg:[^/]+/([^/]+)/', 1) AS namespace,
           regexp_extract(purl, '/([^/@]+)@', 1) AS name,
           regexp_extract(purl, '@([^?]+)', 1) AS version,
           regexp_extract(purl, 'arch=([^&]+)', 1) AS arch
    FROM (
      SELECT p_partkey,
             'pkg:rpm/vendor' || CAST(p_partkey % 3 AS VARCHAR) || '/' ||
             replace(p_name, ' ', '-') || '@' || CAST(p_size AS VARCHAR) ||
             '.0?arch=x86_64' AS purl
      FROM part)
    """,
    doc="E10 purl parse (rhel/csaf_parser.py:11-44): pkg:type/ns/name@ver"
        "?qualifiers decomposed with regex columns — the common-case fast "
        "path; full purl grammar would be the F5 UDF",
    tags=("explode", "scalar"),
)
def e10(spark, sf_dir):
    purl = F.concat(
        F.lit("pkg:rpm/vendor"), (F.col("p_partkey") % 3).cast("string"), F.lit("/"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("-")),
        F.lit("@"), F.col("p_size").cast("string"), F.lit(".0?arch=x86_64"),
    )
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        purl.alias("purl"),
        F.regexp_extract(purl, r"^pkg:([^/]+)/", 1).alias("ptype"),
        F.regexp_extract(purl, r"^pkg:[^/]+/([^/]+)/", 1).alias("namespace"),
        F.regexp_extract(purl, r"/([^/@]+)@", 1).alias("name"),
        F.regexp_extract(purl, r"@([^?]+)", 1).alias("version"),
        F.regexp_extract(purl, r"arch=([^&]+)", 1).alias("arch"),
    )


@register(
    "e11_fpi_channel_parse",
    """
    SELECT fpi,
           CAST(regexp_extract(fpi, '-(\\d+)\\.(\\d+)\\.', 2) AS INT) AS minor,
           CASE WHEN fpi LIKE '%.EUS%' THEN 'eus'
                WHEN fpi LIKE '%.AUS%' THEN 'aus'
                WHEN fpi LIKE '%.E4S%' THEN 'e4s'
                ELSE 'ga' END AS channel
    FROM (
      SELECT 'prod-' || CAST(o_orderkey % 9 AS VARCHAR) || '.' ||
             CAST(o_orderkey % 4 AS VARCHAR) || '.' ||
             CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN 'GA' WHEN 1 THEN 'EUS'
                  WHEN 2 THEN 'AUS' ELSE 'E4S' END AS fpi
      FROM orders) s
    WHERE regexp_extract(fpi, '-(\\d+)\\.(\\d+)\\.', 2) <> ''
    """,
    doc="E11 product-id minor/channel parse (rhel/product_id.py:1-203): "
        "regex minor extraction + channel classification, fully columnar",
    tags=("explode", "scalar"),
)
def e11(spark, sf_dir):
    fpi = F.concat(
        F.lit("prod-"), (F.col("o_orderkey") % 9).cast("string"), F.lit("."),
        (F.col("o_orderkey") % 4).cast("string"), F.lit("."),
        F.when(F.col("o_orderkey") % 4 == 0, "GA")
        .when(F.col("o_orderkey") % 4 == 1, "EUS")
        .when(F.col("o_orderkey") % 4 == 2, "AUS")
        .otherwise("E4S"),
    )
    df = t(spark, sf_dir, "orders").select(fpi.alias("fpi"))
    minor = F.regexp_extract("fpi", r"-(\d+)\.(\d+)\.", 2)
    return df.select(
        "fpi",
        minor.cast("int").alias("minor"),
        F.when(F.col("fpi").like("%.EUS%"), "eus")
        .when(F.col("fpi").like("%.AUS%"), "aus")
        .when(F.col("fpi").like("%.E4S%"), "e4s")
        .otherwise("ga")
        .alias("channel"),
    ).filter(minor != "")


@register(
    "e13_multifield_parse",
    """
    SELECT p_partkey,
           regexp_extract(p_type, '^(\\w+)', 1) AS tier,
           upper(regexp_extract(p_name, '(\\w+)$', 1)) AS item,
           CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS INT) AS brand_num,
           p_size >= 25 AS is_large
    FROM part
    """,
    doc="E13 GHSA node multi-field extraction chain "
        "(github/parser.py:535-789): several typed fields in one projection",
    tags=("explode", "scalar"),
)
def e13(spark, sf_dir):
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("tier"),
        F.upper(F.regexp_extract("p_name", r"(\w+)$", 1)).alias("item"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).cast("int").alias("brand_num"),
        (F.col("p_size") >= 25).alias("is_large"),
    )


@register(
    "e15_cycle_explode",
    """
    SELECT p_partkey AS product, CAST(g.c AS INT) AS cycle
    FROM part, LATERAL (SELECT unnest(generate_series(1, p_size % 4 + 1)) AS c) g
    """,
    doc="E15 EOL product/cycle explode (eol/manager.py:31-56): "
        "explode(sequence(1, n)) per product row",
    tags=("explode",),
)
def e15(spark, sf_dir):
    return (
        t(spark, sf_dir, "part")
        .select(
            F.col("p_partkey").alias("product"),
            F.explode(F.sequence(F.lit(1), F.col("p_size") % 4 + 1)).alias("cycle0"),
        )
        .select("product", F.col("cycle0").cast("int").alias("cycle"))
    )


# CVSS 3.1 base-score math lives in functions/cvss.py since r13 (shared
# with the GHSA envelope, e17); e14 remains the dedicated scoring gate.
@register(
    "e14_cvss_base_score",
    """
    SELECT vector,
           CASE WHEN impact <= 0 THEN 0.0
                WHEN i5 % 10000 = 0 THEN i5 / 100000.0
                ELSE (i5 // 10000 + 1) / 10.0 END AS base_score
    FROM (
      SELECT vector, impact,
             CAST(round(least(CASE WHEN chg THEN 1.08 * (impact + expl)
                              ELSE impact + expl END, 10.0) * 100000)
                  AS BIGINT) AS i5
      FROM (
        SELECT vector, chg,
               CASE WHEN chg
                    THEN 7.52 * (iss - 0.029)
                         - 3.25 * ((((x8 * x4) * x2) * x1))
                    ELSE 6.42 * iss END AS impact,
               8.22 * av * ac * pr * ui AS expl
        FROM (
          SELECT vector, chg, iss, av, ac, pr, ui,
                 x2 * x2 AS x4, (x2 * x2) * (x2 * x2) AS x8, x1, x2
          FROM (
            SELECT vector, chg, iss, av, ac, pr, ui,
                   iss - 0.02 AS x1, (iss - 0.02) * (iss - 0.02) AS x2
            FROM (
              SELECT vector, chg,
                     -- DOUBLE arithmetic throughout: DuckDB's decimal
                     -- literals overflow scale 38 in the ^15 expansion
                     CAST(1 - (1 - c_val) * (1 - i_val) * (1 - a_val)
                          AS DOUBLE) AS iss,
                     av, ac, pr, ui
              FROM (
                SELECT vector,
                       regexp_extract(vector, '/S:([A-Z])', 1) = 'C' AS chg,
                       CASE regexp_extract(vector, '/AV:([A-Z])', 1) WHEN 'N' THEN 0.85 WHEN 'A' THEN 0.62 WHEN 'L' THEN 0.55 ELSE 0.2 END AS av,
                       CASE regexp_extract(vector, '/AC:([A-Z])', 1) WHEN 'L' THEN 0.77 ELSE 0.44 END AS ac,
                       CASE regexp_extract(vector, '/PR:([A-Z])', 1)
                            WHEN 'N' THEN 0.85
                            WHEN 'L' THEN CASE WHEN regexp_extract(vector, '/S:([A-Z])', 1) = 'C' THEN 0.68 ELSE 0.62 END
                            ELSE CASE WHEN regexp_extract(vector, '/S:([A-Z])', 1) = 'C' THEN 0.5 ELSE 0.27 END END AS pr,
                       CASE regexp_extract(vector, '/UI:([A-Z])', 1) WHEN 'N' THEN 0.85 ELSE 0.62 END AS ui,
                       CASE regexp_extract(vector, '/C:([A-Z])', 1) WHEN 'H' THEN 0.56 WHEN 'L' THEN 0.22 ELSE 0.0 END AS c_val,
                       CASE regexp_extract(vector, '/I:([A-Z])', 1) WHEN 'H' THEN 0.56 WHEN 'L' THEN 0.22 ELSE 0.0 END AS i_val,
                       CASE regexp_extract(vector, '/A:([A-Z])', 1) WHEN 'H' THEN 0.56 WHEN 'L' THEN 0.22 ELSE 0.0 END AS a_val
                FROM (
                  SELECT 'CVSS:3.1/AV:' ||
                         CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN 'N' WHEN 1 THEN 'A' WHEN 2 THEN 'L' ELSE 'P' END ||
                         '/AC:' || CASE CAST(o_orderkey % 2 AS INT) WHEN 0 THEN 'L' ELSE 'H' END ||
                         '/PR:' || CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'N' WHEN 1 THEN 'L' ELSE 'H' END ||
                         '/UI:' || CASE CAST(o_orderkey % 2 AS INT) WHEN 0 THEN 'N' ELSE 'R' END ||
                         '/S:' || CASE WHEN o_orderkey % 5 < 3 THEN 'U' ELSE 'C' END ||
                         '/C:' || CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'H' WHEN 1 THEN 'L' ELSE 'N' END ||
                         '/I:' || CASE CAST(o_orderkey % 5 % 3 AS INT) WHEN 0 THEN 'H' WHEN 1 THEN 'L' ELSE 'N' END ||
                         '/A:' || CASE CAST(o_orderkey % 7 % 3 AS INT) WHEN 0 THEN 'H' WHEN 1 THEN 'L' ELSE 'N' END AS vector
                  FROM orders)))))))
    """,
    doc="E14/F3 CVSS 3.1 base-score computation (github/parser.py:604-687 "
        "over the cvss library) as PURE Catalyst expressions — no cvss "
        "library, no UDF — covering BOTH scopes per the public spec: "
        "scope-dependent PR values (L 0.62->0.68, H 0.27->0.5 when "
        "changed), Impact = 6.42*ISS unchanged vs "
        "7.52*(ISS-0.029) - 3.25*(ISS-0.02)^15 changed (the power "
        "expanded to explicit IEEE multiplications so both engines "
        "compute bit-identical doubles), score 0 when Impact <= 0, else "
        "Roundup(min([1.08x](Impact+Expl), 10)) with the SPEC's roundup "
        "(ROUND-to-nearest at 1e-5 per Appendix A's round(input*100000) "
        "— r13 ADVICE fix, floor snapped true values an ulp below a "
        "boundary down a tenth — then exact-boundary passthrough, else "
        "next tenth up).  Since r13 the Spark side delegates to the "
        "shared functions/cvss.py builders that also power the GHSA "
        "envelope (e17)",
    tags=("explode", "scalar", "udf"),
)
def e14(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    okey = F.col("o_orderkey")
    vector = F.concat(
        F.lit("CVSS:3.1/AV:"),
        F.when(okey % 4 == 0, "N").when(okey % 4 == 1, "A")
        .when(okey % 4 == 2, "L").otherwise("P"),
        F.lit("/AC:"), F.when(okey % 2 == 0, "L").otherwise("H"),
        F.lit("/PR:"),
        F.when(okey % 3 == 0, "N").when(okey % 3 == 1, "L").otherwise("H"),
        F.lit("/UI:"), F.when(okey % 2 == 0, "N").otherwise("R"),
        F.lit("/S:"), F.when(okey % 5 < 3, "U").otherwise("C"),
        F.lit("/C:"),
        F.when(okey % 3 == 0, "H").when(okey % 3 == 1, "L").otherwise("N"),
        F.lit("/I:"),
        F.when(okey % 5 % 3 == 0, "H").when(okey % 5 % 3 == 1, "L").otherwise("N"),
        F.lit("/A:"),
        F.when(okey % 7 % 3 == 0, "H").when(okey % 7 % 3 == 1, "L").otherwise("N"),
    )
    from vunnel_spark.functions.cvss import with_cvss3_eval

    df = o.select(vector.alias("vector"))
    df = with_cvss3_eval(df, F.col("vector"), "_c3")
    return df.select("vector", F.col("_c3_base").alias("base_score"))


@register(
    "e17_ghsa_cvss_envelope",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_custkey AS ck,
             CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN 'N' WHEN 1 THEN 'A' WHEN 2 THEN 'L' ELSE 'P' END AS av,
             CASE CAST(o_orderkey % 2 AS INT) WHEN 0 THEN 'L' ELSE 'H' END AS ac,
             CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'N' WHEN 1 THEN 'L' ELSE 'H' END AS pr,
             CASE CAST(o_orderkey % 2 AS INT) WHEN 0 THEN 'N' ELSE 'R' END AS ui,
             CASE WHEN o_orderkey % 5 < 3 THEN 'U' ELSE 'C' END AS sco,
             CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'H' WHEN 1 THEN 'L' ELSE 'N' END AS cc,
             CASE CAST(o_orderkey % 5 % 3 AS INT) WHEN 0 THEN 'H' WHEN 1 THEN 'L' ELSE 'N' END AS ic,
             CASE CAST(o_orderkey % 7 % 3 AS INT) WHEN 0 THEN 'H' WHEN 1 THEN 'L' ELSE 'N' END AS aa,
             CASE WHEN o_orderkey % 2 = 0 THEN '3.1' ELSE '3.0' END AS ver3,
             CASE WHEN o_orderkey % 3 < 2 THEN 'N' ELSE 'P' END AS at4,
             CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'N' WHEN 1 THEN 'P' ELSE 'A' END AS ui4,
             CASE CAST((o_orderkey + 1) % 3 AS INT) WHEN 0 THEN 'H' WHEN 1 THEN 'L' ELSE 'N' END AS sc4,
             CASE CAST((o_orderkey + 2) % 3 AS INT) WHEN 0 THEN 'H' WHEN 1 THEN 'L' ELSE 'N' END AS si4,
             CASE CAST((o_orderkey + 1) % 5 % 3 AS INT) WHEN 0 THEN 'H' WHEN 1 THEN 'L' ELSE 'N' END AS sa4
      FROM orders
    ), strings AS (
      SELECT *,
             'AV:' || av || '/AC:' || ac || '/PR:' || pr || '/UI:' || ui
               || '/S:' || sco || '/C:' || cc || '/I:' || ic AS core7,
             'AV:' || av || '/AC:' || ac || '/PR:' || pr || '/UI:' || ui
               || '/S:' || sco || '/C:' || cc || '/I:' || ic || '/A:' || aa AS core,
             '/AC:' || ac || '/AT:' || at4 || '/PR:' || pr || '/UI:' || ui4
               || '/VC:' || cc || '/VI:' || ic || '/VA:' || aa
               || '/SC:' || sc4 || '/SI:' || si4 AS sfx10,
             CAST(k % 8 AS INT) AS kls, CAST(k % 5 AS INT) AS jls
      FROM base
    ), vecs AS (
      SELECT *,
             (ck % 7 <> 0 AND kls <= 4) AS v3ok,
             (ck % 3 <> 0 AND jls <= 2) AS v4ok,
             -- the STRIPPED vector the envelope stores (removesuffix('/'))
             CASE WHEN kls = 4 THEN 'CVSS:' || ver3 || '/' || core || '/E:F/RL:W'
                  ELSE 'CVSS:' || ver3 || '/' || core END AS v3s,
             CASE WHEN jls = 2 THEN 'CVSS:4.0/AV:' || av || sfx10 || '/SA:' || sa4 || '/U:Green'
                  ELSE 'CVSS:4.0/AV:' || av || sfx10 || '/SA:' || sa4 END AS v4s
      FROM strings
    ), vals AS (
      SELECT *, sco = 'C' AS chg,
             CASE av WHEN 'N' THEN 0.85 WHEN 'A' THEN 0.62 WHEN 'L' THEN 0.55 ELSE 0.2 END AS av_v,
             CASE ac WHEN 'L' THEN 0.77 ELSE 0.44 END AS ac_v,
             CASE pr WHEN 'N' THEN 0.85
                     WHEN 'L' THEN CASE WHEN sco = 'C' THEN 0.68 ELSE 0.62 END
                     ELSE CASE WHEN sco = 'C' THEN 0.5 ELSE 0.27 END END AS pr_v,
             CASE ui WHEN 'N' THEN 0.85 ELSE 0.62 END AS ui_v,
             CASE cc WHEN 'H' THEN 0.56 WHEN 'L' THEN 0.22 ELSE 0.0 END AS c_v,
             CASE ic WHEN 'H' THEN 0.56 WHEN 'L' THEN 0.22 ELSE 0.0 END AS i_v,
             CASE aa WHEN 'H' THEN 0.56 WHEN 'L' THEN 0.22 ELSE 0.0 END AS a_v
      FROM vecs
    ), iss_t AS (
      SELECT *, CAST(1 - (1 - c_v) * (1 - i_v) * (1 - a_v) AS DOUBLE) AS iss
      FROM vals
    ), pow_t AS (
      SELECT *, iss - 0.02 AS x1, (iss - 0.02) * (iss - 0.02) AS x2 FROM iss_t
    ), pow2_t AS (
      SELECT *, x2 * x2 AS x4, (x2 * x2) * (x2 * x2) AS x8 FROM pow_t
    ), sc_t AS (
      SELECT *,
             CASE WHEN chg THEN 7.52 * (iss - 0.029) - 3.25 * ((((x8 * x4) * x2) * x1))
                  ELSE 6.42 * iss END AS impact,
             8.22 * av_v * ac_v * pr_v * ui_v AS expl
      FROM pow2_t
    ), comb_t AS (
      SELECT *, CAST(round(least(CASE WHEN chg THEN 1.08 * (impact + expl)
                                 ELSE impact + expl END, 10.0) * 100000)
                     AS BIGINT) AS i5
      FROM sc_t
    ), score_t AS (
      SELECT *,
             CASE WHEN impact <= 0 THEN 0.0
                  WHEN i5 % 10000 = 0 THEN i5 / 100000.0
                  ELSE (i5 // 10000 + 1) / 10.0 END AS base
      FROM comb_t
    )
    SELECT 'GHSA-' || CAST(k AS VARCHAR) AS ghsa_id,
           CASE WHEN v3ok THEN ver3 END AS legacy_version,
           CASE WHEN v3ok THEN v3s END AS legacy_vector,
           CASE WHEN v3ok THEN base END AS base_score,
           -- expl is exact DECIMAL in DuckDB (2-dp literal products);
           -- cast the rounded value to DOUBLE so canon-formatting
           -- matches Spark ("2" not "2.0"); no reachable value is
           -- within 2e-4 of a .05 tie so decimal-vs-double rounding
           -- cannot disagree (tests/test_text_functions.py pin)
           CASE WHEN v3ok THEN CAST(round(expl, 1) AS DOUBLE) END AS exploitability_score,
           CASE WHEN v3ok THEN CAST(round(impact, 1) AS DOUBLE) END AS impact_score,
           CASE WHEN v3ok THEN
             CASE WHEN base = 0.0 THEN 'None' WHEN base < 4.0 THEN 'Low'
                  WHEN base < 7.0 THEN 'Medium' WHEN base < 9.0 THEN 'High'
                  ELSE 'Critical' END END AS base_severity,
           CASE WHEN v3ok THEN 'N/A' END AS legacy_status,
           concat_ws('|', CASE WHEN v3ok THEN ver3 END,
                          CASE WHEN v4ok THEN '4.0' END) AS entry_versions,
           concat_ws('|', CASE WHEN v3ok THEN v3s END,
                          CASE WHEN v4ok THEN v4s END) AS entry_vectors
    FROM score_t
    """,
    doc="E17: the GHSA CVSS-severities envelope "
        "(github/parser.py:604-687) end-to-end over pipelines/github.py's "
        "cvss_severities_envelope: one trailing-slash strip (removesuffix), "
        "grammar validation of v3.0/v3.1/v4.0 vectors (prefix, per-segment "
        "key:value vocabulary, duplicate keys, mandatory metrics) as pure "
        "Catalyst array expressions, the legacy CVSS object with version "
        "'3.<minor>', quantized base/exploitability/impact sub-scores "
        "(Decimal-half-even-equal, see functions/cvss.py), severities()[0] "
        "and status 'N/A', the v3 {version, vector} entry, and the CVSS4 "
        "validate-only passthrough (version always '4.0', NO score math). "
        "The fixture synthesizes valid/trailing-slash/temporal-metric "
        "vectors plus one malformed class per reference exception branch "
        "(bad prefix, missing mandatory, bad value, unknown key) and NULL "
        "cvssSeverities slots; the ORACLE derives validity independently "
        "from the construction class (never from the string), so a grammar "
        "bug on the Spark side cannot self-confirm",
    tags=("explode", "scalar", "pipeline"),
)
def e17(spark, sf_dir):
    from vunnel_spark.pipelines.github import cvss_severities_envelope

    o = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    ck = F.col("o_custkey")
    av = (F.when(k % 4 == 0, "N").when(k % 4 == 1, "A")
          .when(k % 4 == 2, "L").otherwise("P"))
    ac = F.when(k % 2 == 0, "L").otherwise("H")
    pr = F.when(k % 3 == 0, "N").when(k % 3 == 1, "L").otherwise("H")
    ui = F.when(k % 2 == 0, "N").otherwise("R")
    sco = F.when(k % 5 < 3, "U").otherwise("C")
    cc = F.when(k % 3 == 0, "H").when(k % 3 == 1, "L").otherwise("N")
    ic = F.when(k % 5 % 3 == 0, "H").when(k % 5 % 3 == 1, "L").otherwise("N")
    aa = F.when(k % 7 % 3 == 0, "H").when(k % 7 % 3 == 1, "L").otherwise("N")
    ver3 = F.when(k % 2 == 0, "3.1").otherwise("3.0")
    core7 = F.concat(
        F.lit("AV:"), av, F.lit("/AC:"), ac, F.lit("/PR:"), pr,
        F.lit("/UI:"), ui, F.lit("/S:"), sco, F.lit("/C:"), cc,
        F.lit("/I:"), ic,
    )
    core = F.concat(core7, F.lit("/A:"), aa)
    pfx = F.concat(F.lit("CVSS:"), ver3, F.lit("/"))
    kls = (k % 8).cast("int")
    v3_raw = F.when(ck % 7 == 0, F.lit(None).cast("string")).otherwise(
        F.when(kls <= 2, F.concat(pfx, core))
        .when(kls == 3, F.concat(pfx, core, F.lit("/")))
        .when(kls == 4, F.concat(pfx, core, F.lit("/E:F/RL:W")))
        .when(kls == 5, F.concat(F.lit("CVSS:2.0/"), core))
        .when(kls == 6, F.concat(pfx, core7))
        .otherwise(F.concat(pfx, core, F.lit("/XX:N")))
    )
    at4 = F.when(k % 3 < 2, "N").otherwise("P")
    ui4 = F.when(k % 3 == 0, "N").when(k % 3 == 1, "P").otherwise("A")
    sc4 = (F.when((k + 1) % 3 == 0, "H").when((k + 1) % 3 == 1, "L")
           .otherwise("N"))
    si4 = (F.when((k + 2) % 3 == 0, "H").when((k + 2) % 3 == 1, "L")
           .otherwise("N"))
    sa4 = (F.when((k + 1) % 5 % 3 == 0, "H").when((k + 1) % 5 % 3 == 1, "L")
           .otherwise("N"))
    sfx10 = F.concat(
        F.lit("/AC:"), ac, F.lit("/AT:"), at4, F.lit("/PR:"), pr,
        F.lit("/UI:"), ui4, F.lit("/VC:"), cc, F.lit("/VI:"), ic,
        F.lit("/VA:"), aa, F.lit("/SC:"), sc4, F.lit("/SI:"), si4,
    )
    jls = (k % 5).cast("int")
    v4_raw = F.when(ck % 3 == 0, F.lit(None).cast("string")).otherwise(
        F.when(jls <= 1, F.concat(F.lit("CVSS:4.0/AV:"), av, sfx10,
                                  F.lit("/SA:"), sa4))
        .when(jls == 2, F.concat(F.lit("CVSS:4.0/AV:"), av, sfx10,
                                 F.lit("/SA:"), sa4, F.lit("/U:Green/")))
        .when(jls == 3, F.concat(F.lit("CVSS:4.0/AV:Q"), sfx10,
                                 F.lit("/SA:"), sa4))
        .otherwise(F.concat(F.lit("CVSS:4.0/AV:"), av, sfx10))
    )
    df = o.select(
        F.concat(F.lit("GHSA-"), k.cast("string")).alias("ghsa_id"),
        v3_raw.alias("cvss_v3_vector"),
        v4_raw.alias("cvss_v4_vector"),
    )
    env = cvss_severities_envelope(df)
    return env.select(
        "ghsa_id",
        F.col("legacy_cvss.version").alias("legacy_version"),
        F.col("legacy_cvss.vector_string").alias("legacy_vector"),
        F.col("legacy_cvss.base_metrics.base_score").alias("base_score"),
        F.col("legacy_cvss.base_metrics.exploitability_score").alias(
            "exploitability_score"
        ),
        F.col("legacy_cvss.base_metrics.impact_score").alias("impact_score"),
        F.col("legacy_cvss.base_metrics.base_severity").alias("base_severity"),
        F.col("legacy_cvss.status").alias("legacy_status"),
        # append order v3 then v4 (parser.py:677/:685); concat_ws skips
        # the NULL entries in both engines
        F.concat_ws("|", F.col("cvss_v3.version"), F.col("cvss_v4.version")).alias(
            "entry_versions"
        ),
        F.concat_ws("|", F.col("cvss_v3.vector"), F.col("cvss_v4.vector")).alias(
            "entry_vectors"
        ),
    )


@register(
    "e3_oval_criteria_flatten",
    """
    WITH pairs AS (
      SELECT 'ns:rhel' || CAST(o_custkey % 3 AS VARCHAR) AS namespace_test,
             'pkg:' || CAST(o_orderkey % 50 AS VARCHAR) AS package_test,
             'affirm' AS polarity
      FROM orders
      UNION ALL
      SELECT 'ns:rhel' || CAST(o_custkey % 3 AS VARCHAR),
             'pkg:' || CAST((o_orderkey + 1) % 50 AS VARCHAR),
             'affirm'
      FROM orders
    )
    SELECT namespace_test, polarity, count(*) AS n_pairs,
           count(DISTINCT package_test) AS n_distinct_pkgs
    FROM pairs GROUP BY namespace_test, polarity
    """,
    doc="E3/E4/F4 OVAL criteria-tree walk (utils/oval_v2.py:139-271): "
        "AND/OR tree JSON -> (doc, ns_test, pkg_test, polarity) rows via "
        "one Arrow-batched mapInPandas; nested groups inherit the nearest "
        "namespace test (reference quirk preserved); golden-tested in "
        "tests/test_oval.py.  The input tree is synthesized deterministically "
        "from orders columns, so the oracle states the expected walk output "
        "in plain SQL — the hash-match verifies the recursive UDTF end-to-end",
    tags=("explode", "udf"),
)
def e3(spark, sf_dir):
    from vunnel_spark.operators.oval import flatten_criteria

    # synthesize an AND(ns, OR(pkg...)) tree per order — the canonical
    # OVAL definition shape — as a JSON column
    o = t(spark, sf_dir, "orders")
    tree = F.to_json(
        F.struct(
            F.lit("AND").alias("operator"),
            F.array(
                F.struct(
                    F.concat(F.lit("ns:rhel"), (F.col("o_custkey") % 3).cast("string")).alias("test_ref")
                )
            ).alias("criterions"),
            F.array(
                F.struct(
                    F.lit("OR").alias("operator"),
                    F.array(
                        F.struct(
                            F.concat(F.lit("pkg:"), (F.col("o_orderkey") % 50).cast("string")).alias("test_ref")
                        ),
                        F.struct(
                            F.concat(F.lit("pkg:"), ((F.col("o_orderkey") + 1) % 50).cast("string")).alias("test_ref")
                        ),
                    ).alias("criterions"),
                )
            ).alias("children"),
        )
    )
    docs = o.select(F.col("o_orderkey").cast("string").alias("doc_id"), tree.alias("criteria"))
    flat = flatten_criteria(docs)
    return flat.groupBy("namespace_test", "polarity").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("package_test").alias("n_distinct_pkgs"),
    )


@register(
    "e5_dsa_text_parse",
    """
    WITH lines AS (
      SELECT o_orderkey AS line_no,
             CASE WHEN o_orderkey % 5 = 0
                  THEN '[01 Jan 2024] DSA-' || CAST(o_orderkey AS VARCHAR) || '-1 pkg' ||
                       CAST(o_custkey % 7 AS VARCHAR) || ' - security update'
                  ELSE E'\\t{CVE-2024-' || CAST(o_orderkey AS VARCHAR) || '}'
             END AS line
      FROM orders
    ), classified AS (
      SELECT line_no, line,
             regexp_extract(line, 'DSA-(\\d+)-\\d+', 1) AS dsa_id0,
             regexp_extract(line, 'DSA-\\d+-\\d+ (\\S+)', 1) AS pkg0,
             regexp_extract(line, '\\{(CVE-[0-9-]+)\\}', 1) AS cve
      FROM lines
    ), filled AS (
      SELECT line_no, cve,
             last_value(CASE WHEN dsa_id0 <> '' THEN dsa_id0 END IGNORE NULLS)
               OVER (ORDER BY line_no ROWS UNBOUNDED PRECEDING) AS dsa_id,
             last_value(CASE WHEN pkg0 <> '' THEN pkg0 END IGNORE NULLS)
               OVER (ORDER BY line_no ROWS UNBOUNDED PRECEDING) AS pkg
      FROM classified)
    SELECT dsa_id, pkg, cve
    FROM filled WHERE cve <> '' AND dsa_id IS NOT NULL
    """,
    doc="E5+W4 DSA text-format parse (debian/parser.py:139-243): the "
        "stateful line machine becomes regex classify + header fill-down "
        "(last ignorenulls window) + detail extraction — order-preserving, "
        "no Python state",
    tags=("explode", "window"),
)
def e5(spark, sf_dir):
    from vunnel_spark.operators.windows import fill_down_global

    o = t(spark, sf_dir, "orders")
    line = F.when(
        F.col("o_orderkey") % 5 == 0,
        F.concat(
            F.lit("[01 Jan 2024] DSA-"), F.col("o_orderkey").cast("string"),
            F.lit("-1 pkg"), (F.col("o_custkey") % 7).cast("string"),
            F.lit(" - security update"),
        ),
    ).otherwise(F.concat(F.lit("\t{CVE-2024-"), F.col("o_orderkey").cast("string"), F.lit("}")))
    lines = o.select(F.col("o_orderkey").alias("line_no"), line.alias("line"))
    classified = lines.select(
        "line_no",
        F.nullif(F.regexp_extract("line", r"DSA-(\d+)-\d+", 1), F.lit("")).alias("dsa_id"),
        F.nullif(F.regexp_extract("line", r"DSA-\d+-\d+ (\S+)", 1), F.lit("")).alias("pkg"),
        F.regexp_extract("line", r"\{(CVE-[0-9-]+)\}", 1).alias("cve"),
    )
    # the header fill is global in line order (one logical file) — the
    # distributed two-level carry keeps exact global semantics with no
    # full-frame single-partition window
    filled = fill_down_global(classified, ["dsa_id", "pkg"], "line_no")
    return filled.filter((F.col("cve") != "") & F.col("dsa_id").isNotNull()).select(
        "dsa_id", "pkg", "cve"
    )


@register(
    "e7_pkg_string_heuristic",
    """
    SELECT p_partkey,
           CASE p_partkey % 4
                WHEN 0 THEN nm || '-' || ep || ':' ||
                     CAST(p_size AS VARCHAR) || '.0-' || CAST(p_partkey % 5 AS VARCHAR)
                WHEN 1 THEN ep || ':' || nm || '-' ||
                     CAST(p_size AS VARCHAR) || '.2-' || CAST(p_partkey % 5 AS VARCHAR)
                WHEN 2 THEN nm || ':rhel8-' || CAST(p_partkey % 5 AS VARCHAR)
                ELSE nm || '-' ||
                     CAST(p_size AS VARCHAR) || '.1-' || CAST(p_partkey % 7 AS VARCHAR)
           END AS pkg_string,
           nm AS name,
           CASE p_partkey % 4
                WHEN 0 THEN ep || ':' ||
                     CAST(p_size AS VARCHAR) || '.0-' || CAST(p_partkey % 5 AS VARCHAR)
                WHEN 1 THEN ep || ':' ||
                     CAST(p_size AS VARCHAR) || '.2-' || CAST(p_partkey % 5 AS VARCHAR)
                WHEN 2 THEN NULL
                ELSE CAST(p_size AS VARCHAR) || '.1-' || CAST(p_partkey % 7 AS VARCHAR)
           END AS version
    FROM (SELECT *, replace(p_name, ' ', '-') AS nm,
                 CAST(p_partkey % 2 + 1 AS VARCHAR) AS ep
          FROM part)
    """,
    doc="E7/F6 Hydra package-string heuristic parse (rhel/parser.py:395-438):"
        " name/epoch:version-release disambiguation in one Arrow-batched "
        "struct-returning UDF, exact to _get_name_version (all FOUR branch "
        "shapes synthesized: epoch-in-middle, epoch-at-beginning, app-stream "
        "with version falling back to NULL, plain name-ver-rel); golden "
        "cases in tests/test_text_functions.py.  The pkg strings are "
        "synthesized deterministically from part columns, so the oracle "
        "states the expected (name, version) split directly — the "
        "hash-match verifies the UDF recovers both fields exactly",
    tags=("explode", "udf"),
)
def e7(spark, sf_dir):
    from vunnel_spark.functions.text import split_pkg_string

    p = t(spark, sf_dir, "part")
    nm = F.replace(F.col("p_name"), F.lit(" "), F.lit("-"))
    ep = (F.col("p_partkey") % 2 + 1).cast("string")
    k5 = (F.col("p_partkey") % 5).cast("string")
    pkg = (
        F.when(
            F.col("p_partkey") % 4 == 0,
            F.concat(nm, F.lit("-"), ep, F.lit(":"),
                     F.col("p_size").cast("string"), F.lit(".0-"), k5),
        )
        .when(
            F.col("p_partkey") % 4 == 1,
            F.concat(ep, F.lit(":"), nm, F.lit("-"),
                     F.col("p_size").cast("string"), F.lit(".2-"), k5),
        )
        .when(
            F.col("p_partkey") % 4 == 2,
            F.concat(nm, F.lit(":rhel8-"), k5),
        )
        .otherwise(
            F.concat(nm, F.lit("-"), F.col("p_size").cast("string"),
                     F.lit(".1-"), (F.col("p_partkey") % 7).cast("string"))
        )
    )
    df = p.select("p_partkey", pkg.alias("pkg_string"))
    parsed = df.withColumn("parsed", split_pkg_string(F.col("pkg_string")))
    return parsed.select(
        "p_partkey",
        "pkg_string",
        F.col("parsed.name").alias("name"),
        F.col("parsed.version").alias("version"),
    )
