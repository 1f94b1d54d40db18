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
    SELECT n_nationkey, count(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name NOT IN ('NATION_0', 'NATION_3', 'NATION_7')
    GROUP BY n_nationkey
    """,
    doc="P2 namespace deny-list (reference: skip rhel:3/4, rhel/parser.py:96)",
    tags=("filter",),
)
def p2(spark, sf_dir):
    nation = t(spark, sf_dir, "nation").filter(
        ~F.col("n_name").isin("NATION_0", "NATION_3", "NATION_7")
    )
    return (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
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
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'fixed'
                              WHEN 'O' THEN 'open'
                              WHEN 'P' THEN 'pending'
                              ELSE 'unknown' END AS fix_state
    FROM orders
    """,
    doc="P5 fix-state semantics projection (rhel/parser.py:702-752 state mapping)",
    tags=("filter",),
)
def p5(spark, sf_dir):
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "fixed")
        .when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "P", "pending")
        .otherwise("unknown")
        .alias("fix_state"),
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
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 'Critical'
                WHEN o_orderpriority = '2-HIGH' THEN 'High'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'Medium'
                WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 'Unknown'
                WHEN o_orderpriority = '5-LOW' THEN 'Low'
                ELSE 'Unknown' END AS severity
    FROM orders
    """,
    doc="P8 severity normalization CASE chain (rhel/parser.py:833-849)",
    tags=("filter",),
)
def p8(spark, sf_dir):
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", "Critical")
        .when(F.col("o_orderpriority") == "2-HIGH", "High")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "Medium")
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", "Unknown")
        .when(F.col("o_orderpriority") == "5-LOW", "Low")
        .otherwise("Unknown")
        .alias("severity"),
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
