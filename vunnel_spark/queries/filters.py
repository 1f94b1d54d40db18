"""Projection / filter / predicate operators (SURVEY §2.2 P1-P13).

Each reference operator re-expressed over the driver tables.  All are pure
Catalyst expressions — these exist to prove the predicate surface (regex,
set membership, map lookup, CASE normalization, date parsing) and that each
predicate reaches the parquet scan (verified via PushedFilters in explain).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vunnel_spark.functions.dates import normalize_date
from vunnel_spark.queries._util import t
from vunnel_spark.registry import register


@register(
    "p1_regex_filter",
    """
    SELECT p_partkey, p_name FROM part
    WHERE regexp_matches(p_name, '^(red|cold) ')
    """,
    doc="P1 regex predicate filter (reference: keep ^CVE- ids, debian/parser.py:302)",
    tags=("filter",),
)
def p1(spark, sf_dir):
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").rlike("^(red|cold) "))
        .select("p_partkey", "p_name")
    )


@register(
    "p2_denylist_filter",
    """
    WITH plats AS (
      SELECT c_custkey,
             list_extract(['3', '4', '5', '8', '8.1+eus', '9', '3.0', '4x'],
                          CAST(c_custkey % 8 + 1 AS INT)) AS platform
      FROM customer
    )
    SELECT 'rhel:' || platform AS namespace, count(*) AS n_records
    FROM plats
    WHERE 'rhel:' || platform NOT IN ('rhel:3', 'rhel:4')
    GROUP BY 'rhel:' || platform
    """,
    doc="P2 namespace deny-list, EXACT to the reference's skip_namespaces "
        "default ['rhel:3', 'rhel:4'] (rhel/parser.py:96, applied at "
        ":488/:721/:888 as a full-namespace-string membership test — r13 "
        "re-fixture off the synthesized NATION_* vocab): the test is on "
        "the COMPOSED 'rhel:<platform>' string, so platform '3.0' or "
        "'4x' survives (no prefix matching), and only the exact "
        "rhel:3/rhel:4 namespaces drop",
    tags=("filter",),
)
def p2(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    plats = ["3", "4", "5", "8", "8.1+eus", "9", "3.0", "4x"]
    platform = F.element_at(
        F.array(*[F.lit(p) for p in plats]),
        (F.col("c_custkey") % 8 + 1).cast("int"),
    )
    ns = F.concat(F.lit("rhel:"), platform)
    return (
        c.select(ns.alias("namespace"))
        .filter(~F.col("namespace").isin("rhel:3", "rhel:4"))
        .groupBy("namespace")
        .agg(F.count(F.lit(1)).alias("n_records"))
    )


@register(
    "p3_allowlist_map_join",
    """
    SELECT c_custkey, m.relno
    FROM customer
    JOIN (VALUES ('NATION_1', 1), ('NATION_2', 2), ('NATION_5', 5)) AS m(nname, relno)
      ON c_nationkey = CAST(replace(m.nname, 'NATION_', '') AS INT)
    """,
    doc="P3 release allow-list projection via broadcast map join (debian codename map, debian/parser.py:28-39)",
    tags=("filter", "join"),
)
def p3(spark, sf_dir):
    allow = spark.createDataFrame(
        [("NATION_1", 1), ("NATION_2", 2), ("NATION_5", 5)], "nname string, relno int"
    ).withColumn("nkey", F.replace(F.col("nname"), F.lit("NATION_"), F.lit("")).cast("int"))
    return (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(allow), F.col("c_nationkey") == F.col("nkey"))
        .select("c_custkey", "relno")
    )


@register(
    "p5_fixstate_projection",
    """
    WITH states AS (
      SELECT o_orderkey,
             list_extract(['Affected', 'Fix deferred', 'Will not fix',
                           'Out of support scope', 'Not affected', 'New',
                           'Under investigation', 'Exotic state', NULL],
                          CAST(o_orderkey % 9 + 1 AS INT)) AS fix_state
      FROM orders
    )
    SELECT o_orderkey, fix_state,
           CASE fix_state WHEN 'Not affected' THEN '0' ELSE 'None' END AS version,
           fix_state IN ('Will not fix', 'Out of support scope') AS wont_fix
    FROM states
    WHERE fix_state IN ('Affected', 'Fix deferred', 'Will not fix',
                        'Out of support scope', 'Not affected')
    """,
    doc="P5 fix-state projection, EXACT to the reference's "
        "_fix_state_map_ (rhel/parser.py:702-752, r13 re-fixture off the "
        "synthesized fixed/open/pending vocab): the five mapped states "
        "project their (version, wont_fix) pair — Affected/Fix deferred "
        "-> ('None', false), Will not fix -> ('None', true), Out of "
        "support scope -> ('None', true), Not affected -> ('0', false) — "
        "and unmapped states ('New', 'Under investigation', unknown "
        "tokens, NULL) are SKIPPED, not defaulted.  Driven by the "
        "production _FIX_STATE_MAP constant so the gate pins the same "
        "table rhel1's parse_package_state uses",
    tags=("filter",),
)
def p5(spark, sf_dir):
    from vunnel_spark.pipelines.rhel import _FIX_STATE_MAP

    o = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    tokens = ["Affected", "Fix deferred", "Will not fix",
              "Out of support scope", "Not affected", "New",
              "Under investigation", "Exotic state", None]
    state = F.element_at(
        F.array(*[F.lit(v) for v in tokens]), (k % 9 + 1).cast("int")
    )
    ver = None
    wf = None
    for s, (v, w) in _FIX_STATE_MAP.items():
        cond = F.col("fix_state") == s
        ver = F.when(cond, v) if ver is None else ver.when(cond, v)
        wf = F.when(cond, F.lit(w)) if wf is None else wf.when(cond, F.lit(w))
    return (
        o.select("o_orderkey", state.alias("fix_state"))
        .filter(F.col("fix_state").isin(*_FIX_STATE_MAP))
        .select(
            "o_orderkey", "fix_state",
            ver.alias("version"), wf.alias("wont_fix"),
        )
    )


@register(
    "p6_regex_antifilter",
    """
    SELECT l_suppkey, count(*) AS n_fixed
    FROM (
      SELECT l_suppkey,
             CAST(CAST(l_quantity AS INT) AS VARCHAR) || '.'
               || CAST(l_linenumber AS VARCHAR) || '-'
               || CASE WHEN l_partkey % 6 = 0
                       THEN '2.ksplice1.el7'
                       ELSE CAST(l_partkey % 9 AS VARCHAR) || '.el7' END
               AS version
      FROM lineitem)
    WHERE NOT regexp_matches(regexp_extract(version, '-([^-]*)$', 1), 'ksplice')
    GROUP BY l_suppkey
    """,
    doc="P6 ksplice anti-filter, exact to KspliceFilterer "
        "(oracle/parser.py:145-201 + utils/rpm.py:53-80): the test runs "
        "on the fix VERSION's RELEASE segment (rsplit('-', 1) tail), "
        "matching '.*ksplice.*' — not on the package name; FixedIn "
        "entries drop, the parent record survives.  Synthesized rpm "
        "versions put 'ksplice1' inside the release on every 6th row",
    tags=("filter",),
)
def p6(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    version = F.concat(
        F.col("l_quantity").cast("int").cast("string"),
        F.lit("."), F.col("l_linenumber").cast("string"), F.lit("-"),
        F.when(F.col("l_partkey") % 6 == 0, F.lit("2.ksplice1.el7")).otherwise(
            F.concat((F.col("l_partkey") % 9).cast("string"), F.lit(".el7"))
        ),
    )
    release = F.regexp_extract(version, r"-([^-]*)$", 1)
    return (
        li.select("l_suppkey", release.alias("_rel"))
        .filter(~F.col("_rel").rlike("ksplice"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_fixed"))
    )


@register(
    "p8_severity_normalization",
    """
    WITH toks AS (
      SELECT o_orderkey,
             list_extract(['Critical', 'IMPORTANT', 'moderate', 'low',
                           'unknown', 'severe', '', NULL],
                          CAST(o_orderkey % 8 + 1 AS INT)) AS rhel_tok,
             list_extract(['LOW', 'MODERATE', 'HIGH', 'CRITICAL',
                           'Moderate', 'bogus', NULL],
                          CAST(o_orderkey % 7 + 1 AS INT)) AS gh_tok,
             list_extract(['low', 'low**', 'medium', 'medium**', 'high',
                           'high**', 'unimportant', 'not yet assigned',
                           'end-of-life', NULL],
                          CAST(o_orderkey % 10 + 1 AS INT)) AS urgency,
             list_extract(['High', 'Medium', '', NULL],
                          CAST(o_orderkey % 4 + 1 AS INT)) AS nvd_sev
      FROM orders
    )
    SELECT o_orderkey,
           -- rhel/parser.py:833-849: falsy -> Unknown, lower() then map
           CASE WHEN rhel_tok IS NULL OR rhel_tok = '' THEN 'Unknown'
                WHEN lower(rhel_tok) = 'critical' THEN 'Critical'
                WHEN lower(rhel_tok) = 'important' THEN 'High'
                WHEN lower(rhel_tok) = 'moderate' THEN 'Medium'
                WHEN lower(rhel_tok) = 'low' THEN 'Low'
                ELSE 'Unknown' END AS rhel_sev,
           -- github/parser.py:595-602: case-SENSITIVE get, Unknown default
           CASE gh_tok WHEN 'LOW' THEN 'Low' WHEN 'MODERATE' THEN 'Medium'
                       WHEN 'HIGH' THEN 'High' WHEN 'CRITICAL' THEN 'Critical'
                       ELSE 'Unknown' END AS github_sev,
           -- debian/parser.py:356-374: starred tokens, unimportant ->
           -- Negligible, truthy-nvd fallback else Unknown
           CASE WHEN urgency IS NULL THEN
                  CASE WHEN nvd_sev IS NOT NULL AND nvd_sev <> ''
                       THEN nvd_sev ELSE 'Unknown' END
                WHEN urgency IN ('low', 'low**') THEN 'Low'
                WHEN urgency IN ('medium', 'medium**') THEN 'Medium'
                WHEN urgency IN ('high', 'high**') THEN 'High'
                WHEN urgency = 'unimportant' THEN 'Negligible'
                ELSE CASE WHEN nvd_sev IS NOT NULL AND nvd_sev <> ''
                          THEN nvd_sev ELSE 'Unknown' END END AS debian_sev
    FROM toks
    """,
    doc="P8 severity normalization, EXACT per-source reference maps (r13 "
        "re-fixture off the synthesized CASE vocab): rhel threat_severity "
        "(parser.py:833-849 — falsy->Unknown, lower() THEN the five-token "
        "chain, no strip), GHSA (parser.py:595-602 — case-SENSITIVE upper "
        "tokens, Unknown default), debian urgency (parser.py:356-374 — "
        "starred low**/medium**/high** variants, unimportant->Negligible, "
        "truthy nvd-severity fallback else Unknown, absent-urgency "
        "fallback).  Tokens synthesized to hit every branch including "
        "case-mismatch ('IMPORTANT' maps for rhel, 'Moderate' does NOT "
        "for github), empty string vs NULL, and the empty-nvd fallback",
    tags=("filter",),
)
def p8(spark, sf_dir):
    from vunnel_spark.functions.severity import (
        debian_severity,
        github_severity,
        rhel_severity,
    )

    o = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")

    def pick(values, mod):
        arr = F.array(*[F.lit(v) for v in values])
        return F.element_at(arr, (k % mod + 1).cast("int"))

    toks = o.select(
        "o_orderkey",
        pick(["Critical", "IMPORTANT", "moderate", "low", "unknown",
              "severe", "", None], 8).alias("rhel_tok"),
        pick(["LOW", "MODERATE", "HIGH", "CRITICAL", "Moderate", "bogus",
              None], 7).alias("gh_tok"),
        pick(["low", "low**", "medium", "medium**", "high", "high**",
              "unimportant", "not yet assigned", "end-of-life", None],
             10).alias("urgency"),
        pick(["High", "Medium", "", None], 4).alias("nvd_sev"),
    )
    return toks.select(
        "o_orderkey",
        rhel_severity(F.col("rhel_tok")).alias("rhel_sev"),
        github_severity(F.col("gh_tok")).alias("github_sev"),
        debian_severity(F.col("urgency"), F.col("nvd_sev")).alias("debian_sev"),
    )


@register(
    "p10_regex_classifier",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '^(\\w+) (\\w+)$', 2) AS base_item,
           regexp_extract(p_name, '^(\\w+) (\\w+)$', 1) AS variant
    FROM part
    WHERE regexp_extract(p_name, '^(\\w+) (\\w+)$', 2) <> ''
    """,
    doc="P10 Pro->base regex classifier (ubuntu/parser.py:48-92)",
    tags=("filter",),
)
def p10(spark, sf_dir):
    pat = r"^(\w+) (\w+)$"
    df = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.regexp_extract("p_name", pat, 2).alias("base_item"),
        F.regexp_extract("p_name", pat, 1).alias("variant"),
    )
    return df.filter(F.col("base_item") != "")


@register(
    "p13_date_normalization",
    """
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS norm_date
    FROM orders
    """,
    doc="P13 multi-format date normalization -> YYYY-MM-DD (utils/date.py:6-12); "
        "round-trips through strings in 2 formats to exercise try_to_timestamp chain",
    tags=("filter", "scalar"),
)
def p13(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    # format dates as heterogeneous strings, then normalize back
    raw = orders.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 2 == 0, F.date_format("o_orderdate", "yyyy-MM-dd")
        )
        .otherwise(F.date_format("o_orderdate", "yyyy/MM/dd"))
        .alias("raw_date"),
    )
    return raw.select("o_orderkey", normalize_date(F.col("raw_date")).alias("norm_date"))


@register(
    "p4_ecosystem_allowlist_rename",
    """
    SELECT c_custkey, m.slug AS ecosystem
    FROM customer
    JOIN (VALUES ('BUILDING', 'bld'), ('AUTOMOBILE', 'auto'), ('MACHINERY', 'mach'))
      AS m(segment, slug)
      ON c_mktsegment = m.segment
    """,
    doc="P4 ecosystem allow-list + rename (github/parser.py:42-55 GHSA "
        "ecosystem -> syft type): unmapped values dropped, mapped renamed",
    tags=("filter",),
)
def p4(spark, sf_dir):
    mapping = F.create_map(
        F.lit("BUILDING"), F.lit("bld"),
        F.lit("AUTOMOBILE"), F.lit("auto"),
        F.lit("MACHINERY"), F.lit("mach"),
    )
    return (
        t(spark, sf_dir, "customer")
        .select("c_custkey", F.element_at(mapping, F.col("c_mktsegment")).alias("ecosystem"))
        .filter(F.col("ecosystem").isNotNull())
    )


@register(
    "p7_rejected_pair_antifilter",
    """
    SELECT l.l_orderkey, l.l_partkey, l.l_suppkey
    FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM part p
      WHERE p.p_size < 5 AND p.p_partkey = l.l_partkey)
    """,
    doc="P7 rejected-pair anti-filter (alpine/parser.py:243-273 secfixes "
        "rejections): rows dropped when their key appears in the deny table",
    tags=("filter", "join"),
)
def p7(spark, sf_dir):
    rejected = t(spark, sf_dir, "part").filter(F.col("p_size") < 5).select("p_partkey")
    return (
        t(spark, sf_dir, "lineitem")
        .join(rejected, F.col("l_partkey") == F.col("p_partkey"), "left_anti")
        .select("l_orderkey", "l_partkey", "l_suppkey")
    )


@register(
    "p9_withdrawn_passthrough",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN CAST(o_orderdate AS DATE) END AS withdrawn_at,
           CASE WHEN o_orderstatus = 'F' THEN 'GENERAL' ELSE 'MALWARE' END AS classification
    FROM orders
    """,
    doc="P9 withdrawn/classification passthrough projection "
        "(github/parser.py:572-574, 767-768)",
    tags=("filter",),
)
def p9(spark, sf_dir):
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", F.col("o_orderdate").cast("date")).alias(
            "withdrawn_at"
        ),
        F.when(F.col("o_orderstatus") == "F", "GENERAL").otherwise("MALWARE").alias(
            "classification"
        ),
    )


@register(
    "p11_cpe_normalization",
    """
    SELECT p_partkey, cpe22,
           'cpe:2.3:a:' || parts[3] || ':' || parts[4] || ':' || parts[5] || ':*:*:*:*:*:*:*'
             AS cpe23
    FROM (
      SELECT p_partkey,
             'cpe:/a:' || p_brand || ':' || replace(p_name, ' ', '_') || ':' ||
               CAST(p_size AS VARCHAR) AS cpe22,
             string_split('cpe:/a:' || p_brand || ':' || replace(p_name, ' ', '_') || ':' ||
               CAST(p_size AS VARCHAR), ':') AS parts
      FROM part)
    """,
    doc="P11 CPE 2.2 -> 2.3 normalization for fix-date join keys "
        "(tool/fixdate/grype_db_first_observed.py:22-56): split + rebuild",
    tags=("filter", "scalar"),
)
def p11(spark, sf_dir):
    cpe22 = F.concat_ws(
        ":",
        F.lit("cpe"),
        F.lit("/a"),
        F.col("p_brand"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")),
        F.col("p_size").cast("string"),
    )
    parts = F.split(cpe22, ":")
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        cpe22.alias("cpe22"),
        F.concat_ws(
            ":",
            F.lit("cpe"), F.lit("2.3"), F.lit("a"),
            F.element_at(parts, 3), F.element_at(parts, 4), F.element_at(parts, 5),
            F.lit("*"), F.lit("*"), F.lit("*"), F.lit("*"), F.lit("*"), F.lit("*"), F.lit("*"),
        ).alias("cpe23"),
    )


@register(
    "p12_pkgname_normalization",
    """
    SELECT p_partkey,
           lower(regexp_replace(replace(p_name, ' ', '_'), '[-_.]+', '-', 'g')) AS norm_name
    FROM part
    """,
    doc="P12 PEP-503 package-name normalization "
        "(tool/fixdate/ecosystem.py:1-11): runs of -_. collapse to -, lowered",
    tags=("filter", "scalar"),
)
def p12(spark, sf_dir):
    raw = F.replace(F.col("p_name"), F.lit(" "), F.lit("_"))
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.lower(F.regexp_replace(raw, "[-_.]+", "-")).alias("norm_name"),
    )
