"""Join-family operators (SURVEY §2.4 J1-J14).

The reference's core semantics are hand-built hash joins over dicts; here
each becomes a declarative join whose physical strategy Catalyst/AQE picks.
Scale notes per query:
- literal dims are broadcast-hinted; SF-scaling sides are left to AQE;
- anti-joins shuffle only the (small) distinct key set of the right side;
- priority picks are one window shuffle on the partition key.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vunnel_spark.queries._util import t
from vunnel_spark.registry import register


@register(
    "j1_theta_startswith_join",
    """
    SELECT p_partkey, pfx
    FROM part JOIN (VALUES ('red'), ('small'), ('large')) AS v(pfx)
      ON starts_with(p_name, pfx)
    """,
    doc="J1 theta-condition join: platform-CPE startswith lookup "
        "(rhel/csaf_parser.py:134-282 FPI startswith(ar_cpe)); broadcast the "
        "literal dim, theta condition evaluated post-broadcast (no shuffle)",
    tags=("join",),
)
def j1(spark, sf_dir):
    pfx = spark.createDataFrame([("red",), ("small",), ("large",)], "pfx string")
    return (
        t(spark, sf_dir, "part")
        .join(F.broadcast(pfx), F.col("p_name").startswith(F.col("pfx")))
        .select("p_partkey", "pfx")
    )


@register(
    "j2_leftjoin_collect_advisories",
    """
    SELECT o_orderkey,
           COALESCE(array_to_string(list_sort(
             list(l_partkey || ':' || CAST(l_quantity AS INT))
                  FILTER (WHERE l_partkey IS NOT NULL)), '|'), '') AS advisories
    FROM orders LEFT JOIN lineitem
      ON o_orderkey = l_orderkey AND l_returnflag = 'A'
    GROUP BY o_orderkey
    """,
    doc="J2 CVE-to-DSA advisory left join + per-key list assembly "
        "(debian/parser.py:109-137, 245-274): unmatched keys get []. "
        "Serialized '|'-joined (gate canonicalizer needs hashable scalars)",
    tags=("join", "agg"),
)
def j2(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "A")
    adv = F.concat_ws(":", F.col("l_partkey"), F.col("l_quantity").cast("int"))
    return (
        t(spark, sf_dir, "orders")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .groupBy("o_orderkey")
        .agg(F.concat_ws("|", F.array_sort(F.collect_list(adv))).alias("advisories"))
    )


@register(
    "j5_rejection_antijoin",
    """
    SELECT l.l_orderkey, count(*) AS n_kept
    FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem r
      WHERE r.l_returnflag = 'R'
        AND r.l_orderkey = l.l_orderkey AND r.l_partkey = l.l_partkey)
    GROUP BY l.l_orderkey
    """,
    doc="J5 rejected-(pkg,cve)-pair anti-join (alpine/parser.py:243-273): "
        "left_anti on 2-col key; right side reduced to distinct keys first",
    tags=("join",),
)
def j5(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    rejections = (
        li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_partkey").distinct()
    )
    return (
        li.join(rejections, ["l_orderkey", "l_partkey"], "left_anti")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


@register(
    "j8_override_merge",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderpriority, [o_orderstatus, 'base'] AS refs
      FROM orders
    ), ovr AS (
      SELECT o_orderkey, 'OVERRIDDEN' AS new_priority,
             ['ovr-' || CAST(o_orderkey % 3 AS VARCHAR)] AS ovr_refs
      FROM orders WHERE o_orderkey % 7 = 0
    )
    SELECT b.o_orderkey,
           COALESCE(v.new_priority, b.o_orderpriority) AS priority,
           array_to_string(list_sort(list_distinct(
             list_concat(b.refs, COALESCE(v.ovr_refs, [])))), '|') AS refs
    FROM base b LEFT JOIN ovr v ON b.o_orderkey = v.o_orderkey
    """,
    doc="J8 NVD override patch join (nvd/manager.py:304-339): override doc "
        "replaces the config field, set-unions reference lists by url. "
        "Serialized '|'-joined (gate canonicalizer needs hashable scalars)",
    tags=("join",),
)
def j8(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.array(F.col("o_orderstatus"), F.lit("base")).alias("refs"),
    )
    ovr = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            F.lit("OVERRIDDEN").alias("new_priority"),
            F.array(F.concat(F.lit("ovr-"), (F.col("o_orderkey") % 3).cast("string"))).alias("ovr_refs"),
        )
    )
    return (
        base.join(ovr, "o_orderkey", "left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("new_priority"), F.col("o_orderpriority")).alias("priority"),
            F.concat_ws(
                "|",
                F.array_sort(
                    F.array_union(F.col("refs"), F.coalesce(F.col("ovr_refs"), F.array()))
                ),
            ).alias("refs"),
        )
    )


@register(
    "j9_fixdate_priority_pick",
    """
    SELECT o_orderkey, best_date, best_line FROM (
      SELECT o_orderkey,
             CAST(l_shipdate AS DATE) AS best_date, l_linenumber AS best_line,
             row_number() OVER (
               PARTITION BY o_orderkey
               ORDER BY (l_returnflag <> 'N'), l_shipdate, l_linenumber) AS rn
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= o_orderdate)
    WHERE rn = 1
    """,
    doc="J9+W1 fix-date enrichment with candidate-priority pick "
        "(tool/fixdate/finder.py:137-203): accurate-source-first ordering, "
        "observation-cap filter, single best per key via one window",
    tags=("join", "window"),
)
def j9(spark, sf_dir):
    from vunnel_spark.operators.windows import priority_pick

    cand = (
        t(spark, sf_dir, "orders")
        .join(t(spark, sf_dir, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
    )
    best = priority_pick(
        cand,
        ["o_orderkey"],
        [(F.col("l_returnflag") != "N"), F.col("l_shipdate"), F.col("l_linenumber")],
    )
    return best.select(
        "o_orderkey",
        F.col("l_shipdate").cast("date").alias("best_date"),
        F.col("l_linenumber").alias("best_line"),
    )


@register(
    "j12_notfixed_suppression",
    """
    SELECT f.l_suppkey, count(*) AS n_fixed
    FROM lineitem f
    WHERE f.l_linestatus = 'F' AND NOT EXISTS (
      SELECT 1 FROM lineitem n
      WHERE n.l_returnflag = 'R'
        AND n.l_orderkey = f.l_orderkey AND n.l_suppkey = f.l_suppkey)
    GROUP BY f.l_suppkey
    """,
    doc="J12 not-fixed-trumps-fixed anti-join (rhel/parser.py:859-875): "
        "fix rows suppressed when the same key appears in package_state",
    tags=("join",),
)
def j12(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    not_fixed = (
        li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").distinct()
    )
    return (
        li.filter(F.col("l_linestatus") == "F")
        .join(not_fixed, ["l_orderkey", "l_suppkey"], "left_anti")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_fixed"))
    )


@register(
    "j14_union_merge_priority",
    """
    SELECT rec_key, status, src FROM (
      SELECT rec_key, status, src,
             row_number() OVER (PARTITION BY rec_key ORDER BY pri) AS rn
      FROM (
        SELECT o_orderkey AS rec_key, o_orderstatus AS status, 'current' AS src, 1 AS pri
        FROM orders
        UNION ALL
        SELECT CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey
                    ELSE o_orderkey + 10000000 END AS rec_key,
               'L' AS status, 'legacy' AS src, 2 AS pri
        FROM orders))
    WHERE rn = 1
    """,
    doc="J14 legacy-results union-merge, current-wins on key "
        "(debian/parser.py:495-618): unionByName + priority dedup window",
    tags=("join", "setop"),
)
def j14(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    current = orders.select(
        F.col("o_orderkey").alias("rec_key"),
        F.col("o_orderstatus").alias("status"),
        F.lit("current").alias("src"),
        F.lit(1).alias("pri"),
    )
    legacy = orders.select(
        F.when(F.col("o_orderkey") % 2 == 0, F.col("o_orderkey"))
        .otherwise(F.col("o_orderkey") + 10000000)
        .alias("rec_key"),
        F.lit("L").alias("status"),
        F.lit("legacy").alias("src"),
        F.lit(2).alias("pri"),
    )
    merged = current.unionByName(legacy)
    w = Window.partitionBy("rec_key").orderBy("pri")
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("rec_key", "status", "src")
    )


@register(
    "j7_anti_union_synthesis",
    """
    SELECT c_key, o_key, origin FROM (
      SELECT o_custkey AS c_key, o_orderkey AS o_key, 'base' AS origin
      FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT p.o_custkey, p.o_orderkey, 'synth'
      FROM orders p
      WHERE p.o_orderpriority = '1-URGENT'
        AND NOT EXISTS (SELECT 1 FROM orders b
                        WHERE b.o_orderstatus = 'F' AND b.o_custkey = p.o_custkey))
    """,
    doc="J7 Pro-to-base inference merge (ubuntu/parser.py:95-158): anti-join "
        "Pro rows vs base keys, synthesize missing entries, union into base",
    tags=("join", "setop"),
)
def j7(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderstatus") == "F")
    pro = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    synth = pro.join(
        base.select("o_custkey").distinct(), "o_custkey", "left_anti"
    ).select(
        F.col("o_custkey").alias("c_key"),
        F.col("o_orderkey").alias("o_key"),
        F.lit("synth").alias("origin"),
    )
    base_rows = base.select(
        F.col("o_custkey").alias("c_key"),
        F.col("o_orderkey").alias("o_key"),
        F.lit("base").alias("origin"),
    )
    return base_rows.unionByName(synth)


@register(
    "j3_sibling_fill",
    """
    SELECT o_orderkey, o_custkey,
           max(marker) OVER (PARTITION BY o_custkey) AS group_marker
    FROM (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 5 = 0 THEN 'dsa-' || CAST(o_custkey AS VARCHAR) END AS marker
      FROM orders)
    """,
    doc="J3 DSA intra-group fill (debian/parser.py:214-260): siblings "
        "sharing a base id copy the populated sibling's value — max() over "
        "the group window (deterministic, order-free)",
    tags=("join", "window"),
)
def j3(spark, sf_dir):
    from pyspark.sql import Window

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.when(
            F.col("o_orderkey") % 5 == 0,
            F.concat(F.lit("dsa-"), F.col("o_custkey").cast("string")),
        ).alias("marker"),
    )
    w = Window.partitionBy("o_custkey")
    return orders.select(
        "o_orderkey", "o_custkey", F.max("marker").over(w).alias("group_marker")
    )


@register(
    "j4_semi_overlay_update",
    """
    SELECT o_orderkey,
           CASE WHEN EXISTS (
             SELECT 1 FROM lineitem
             WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
           THEN 'wont-fix' ELSE o_orderstatus END AS status
    FROM orders
    """,
    doc="J4 VEX wont-fix overlay (ubuntu/parser.py:203-234): left-semi "
        "membership stamps the status field — implemented as a left join "
        "on the distinct overlay key + conditional withField-style update",
    tags=("join",),
)
def j4(spark, sf_dir):
    overlay = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
        .withColumn("_in_overlay", F.lit(True))
    )
    return (
        t(spark, sf_dir, "orders")
        .join(overlay, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .select(
            "o_orderkey",
            F.when(F.col("_in_overlay"), "wont-fix")
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
        )
    )


@register(
    "j6_subpage_concat",
    """
    SELECT a.o_custkey,
           array_to_string(list_sort(list_distinct(list_concat(a.page1, b.page2))), '|')
             AS all_ids
    FROM (
      SELECT o_custkey, list(o_orderkey ORDER BY o_orderkey) AS page1
      FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_custkey
    ) a JOIN (
      SELECT o_custkey, list(o_orderkey ORDER BY o_orderkey) AS page2
      FROM orders WHERE o_orderkey % 2 = 1 GROUP BY o_custkey
    ) b ON a.o_custkey = b.o_custkey
    """,
    doc="J6 advisory + sub-paginated vulns merge (github/parser.py:161-184):"
        " join on the advisory id, concat + dedup the page arrays. "
        "Serialized '|'-joined (gate canonicalizer needs hashable scalars)",
    tags=("join", "setop"),
)
def j6(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    page1 = (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .groupBy("o_custkey")
        .agg(F.array_sort(F.collect_list("o_orderkey")).alias("page1"))
    )
    page2 = (
        orders.filter(F.col("o_orderkey") % 2 == 1)
        .groupBy("o_custkey")
        .agg(F.array_sort(F.collect_list("o_orderkey")).alias("page2"))
    )
    return page1.join(page2, "o_custkey").select(
        "o_custkey",
        F.concat_ws("|", F.array_sort(F.array_union("page1", "page2"))).alias("all_ids"),
    )


@register(
    "j13_base_platform_inference",
    """
    SELECT platform, o_orderkey AS rec, origin FROM (
      SELECT 'plat-' || CAST(o_custkey % 20 AS VARCHAR) AS platform, o_orderkey, 'real' AS origin
      FROM orders WHERE o_orderkey % 3 <> 0
      UNION ALL
      SELECT base, e.o_orderkey, 'inferred' FROM (
        SELECT 'plat-' || CAST(o_custkey % 20 AS VARCHAR) AS base, o_orderkey
        FROM orders WHERE o_orderkey % 3 = 0) e
      WHERE NOT EXISTS (
        SELECT 1 FROM orders b
        WHERE b.o_orderkey % 3 <> 0
          AND 'plat-' || CAST(b.o_custkey % 20 AS VARCHAR) = e.base))
    """,
    doc="J13 EUS/ELS -> base-platform inference (rhel/parser.py:882-904): "
        "extended-support rows synthesize base-platform records only when "
        "the base platform is absent — anti-join on the derived key + union",
    tags=("join", "setop"),
)
def j13(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    plat = F.concat(F.lit("plat-"), (F.col("o_custkey") % 20).cast("string"))
    real = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        plat.alias("platform"), F.col("o_orderkey").alias("rec"), F.lit("real").alias("origin")
    )
    eus = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        plat.alias("platform"), F.col("o_orderkey").alias("rec")
    )
    inferred = eus.join(
        real.select("platform").distinct(), "platform", "left_anti"
    ).select("platform", "rec", F.lit("inferred").alias("origin"))
    return real.unionByName(inferred)


@register(
    "e9_product_tree_deref",
    """
    WITH rel AS (
      SELECT 'fpi-' || CAST(o_orderkey AS VARCHAR) AS product_id,
             'plat-' || CAST(o_custkey % 20 AS VARCHAR) AS parent_id
      FROM orders
    ), purls AS (
      SELECT 'fpi-' || CAST(o_orderkey AS VARCHAR) AS product_id,
             'pkg:rpm/p' || CAST(o_orderkey % 50 AS VARCHAR) || '@' ||
               CAST(o_orderkey % 9 AS VARCHAR) AS purl
      FROM orders WHERE o_orderkey % 3 <> 2
    )
    SELECT r.product_id, r.parent_id AS platform,
           regexp_extract(p.purl, '/([^/@]+)@', 1) AS pkg_name,
           regexp_extract(p.purl, '@(.+)$', 1) AS pkg_version
    FROM rel r LEFT JOIN purls p ON r.product_id = p.product_id
    """,
    doc="E9 CSAF product-tree dereference (rhel/csaf_parser.py:70-131; maps "
        "built in utils/csaf_types.py:200-233): the per-doc parent/purl "
        "dicts become two lookup frames joined on product_id — dict lookups "
        "re-expressed as joins, missing purls stay null (left join)",
    tags=("explode", "join"),
)
def e9(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    fpi = F.concat(F.lit("fpi-"), F.col("o_orderkey").cast("string"))
    rel = o.select(
        fpi.alias("product_id"),
        F.concat(F.lit("plat-"), (F.col("o_custkey") % 20).cast("string")).alias("parent_id"),
    )
    purls = o.filter(F.col("o_orderkey") % 3 != 2).select(
        fpi.alias("product_id"),
        F.concat(
            F.lit("pkg:rpm/p"), (F.col("o_orderkey") % 50).cast("string"),
            F.lit("@"), (F.col("o_orderkey") % 9).cast("string"),
        ).alias("purl"),
    )
    return rel.join(purls, "product_id", "left").select(
        "product_id",
        F.col("parent_id").alias("platform"),
        F.regexp_extract("purl", r"/([^/@]+)@", 1).alias("pkg_name"),
        F.regexp_extract("purl", r"@(.+)$", 1).alias("pkg_version"),
    )


@register(
    "j10_usn_fixdate_overlay",
    """
    WITH aff AS (
      SELECT 'ubuntu:' || CAST(l_suppkey % 4 AS VARCHAR) AS eco,
             'pkg' || CAST(l_partkey % 100 AS VARCHAR) AS pkg,
             CAST(CAST(l_quantity AS INT) AS VARCHAR) || '.' ||
               CAST(l_linenumber AS VARCHAR) AS ver,
             CAST(o_orderdate AS DATE) AS published,
             CAST(l_shipdate AS DATE) AS shipped
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), overlay AS (
      SELECT eco, pkg, ver, min(published) AS cand_date, 1 AS pri, 'usn' AS src
      FROM aff GROUP BY eco, pkg, ver
    ), first_obs AS (
      SELECT eco, pkg, ver, min(shipped) AS cand_date, 2 AS pri,
             'first_observed' AS src
      FROM aff GROUP BY eco, pkg, ver
    ), cand AS (
      SELECT * FROM overlay UNION ALL SELECT * FROM first_obs
    )
    SELECT eco, pkg, ver, cand_date AS fix_date, src FROM (
      SELECT eco, pkg, ver, cand_date, src,
             row_number() OVER (PARTITION BY eco, pkg, ver
                                ORDER BY pri, cand_date) AS rn
      FROM cand)
    WHERE rn = 1
    """,
    doc="J10 USN fix-date overlay (ubuntu/usn_fixdate_overlay.py:36-137, "
        "applied at parser.py:523-546): the overlay is a min-aggregate per "
        "(ecosystem, pkg, fixed-version) tuple — earliest USN wins because "
        "Canonical re-ships fix tuples in follow-up USNs — whose dates join "
        "the candidate pool ahead of first-observed dates; the J9 priority "
        "pick then takes the best (source-priority, date) per tuple.  One "
        "groupBy per source + one window on the tuple key; no driver state",
    tags=("join", "agg", "window"),
)
def j10(spark, sf_dir):
    from vunnel_spark.operators.windows import priority_pick

    aff = (
        t(spark, sf_dir, "lineitem")
        .join(t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("ubuntu:"), (F.col("l_suppkey") % 4).cast("string")).alias("eco"),
            F.concat(F.lit("pkg"), (F.col("l_partkey") % 100).cast("string")).alias("pkg"),
            F.concat_ws(
                ".", F.col("l_quantity").cast("int"), F.col("l_linenumber")
            ).alias("ver"),
            F.col("o_orderdate").cast("date").alias("published"),
            F.col("l_shipdate").cast("date").alias("shipped"),
        )
    )
    overlay = aff.groupBy("eco", "pkg", "ver").agg(F.min("published").alias("cand_date"))
    first_obs = aff.groupBy("eco", "pkg", "ver").agg(F.min("shipped").alias("cand_date"))
    cand = overlay.select(
        "eco", "pkg", "ver", "cand_date", F.lit(1).alias("pri"), F.lit("usn").alias("src")
    ).unionByName(
        first_obs.select(
            "eco", "pkg", "ver", "cand_date",
            F.lit(2).alias("pri"), F.lit("first_observed").alias("src"),
        )
    )
    best = priority_pick(cand, ["eco", "pkg", "ver"], [F.col("pri"), F.col("cand_date")])
    return best.select("eco", "pkg", "ver", F.col("cand_date").alias("fix_date"), "src")
