"""Window-function operators (SURVEY §2.6 W1-W5, §2.7 O4).

Each is one Window spec: a single shuffle on the partition key, then
streaming evaluation within sorted partitions.  W1 (priority pick) is
exercised by j9_fixdate_priority_pick; this module covers W2-W5 + top-k.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vunnel_spark.queries._util import t
from vunnel_spark.registry import register


@register(
    "w2_ael_demotion_pick",
    """
    SELECT o_custkey, o_orderkey AS picked, is_backup FROM (
      SELECT o_custkey, o_orderkey,
             (o_orderstatus <> 'F') AS is_backup,
             row_number() OVER (PARTITION BY o_custkey
                ORDER BY (o_orderstatus <> 'F'),
                         CASE WHEN o_orderstatus = 'F' THEN o_orderdate END ASC,
                         CASE WHEN o_orderstatus = 'F' THEN o_orderkey END ASC,
                         CASE WHEN o_orderstatus <> 'F' THEN o_orderdate END DESC,
                         CASE WHEN o_orderstatus <> 'F' THEN o_orderkey END DESC
             ) AS rn
      FROM orders)
    WHERE rn = 1
    """,
    doc="W2 ael-demotion pick (rhel/csaf_parser.py:263-282): the FIRST "
        "non-ael candidate short-circuits, but the ael backup variable is "
        "overwritten on every alternative match — so when only ael "
        "candidates exist the LAST one in candidate order wins, not the "
        "first (r12 fidelity pass).  One window: boolean-first, then "
        "candidate order ascending for reals and DESCENDING for backups",
    tags=("window",),
)
def w2(spark, sf_dir):
    from vunnel_spark.operators.windows import priority_pick

    orders = t(spark, sf_dir, "orders").withColumn(
        "is_backup", F.col("o_orderstatus") != "F"
    )
    bk = F.col("is_backup")
    picked = priority_pick(
        orders,
        ["o_custkey"],
        [
            bk,
            F.when(~bk, F.col("o_orderdate")).asc(),
            F.when(~bk, F.col("o_orderkey")).asc(),
            F.when(bk, F.col("o_orderdate")).desc(),
            F.when(bk, F.col("o_orderkey")).desc(),
        ],
    )
    return picked.select("o_custkey", F.col("o_orderkey").alias("picked"), "is_backup")


@register(
    "w3_newest_stream_canonical",
    """
    SELECT l_suppkey, l_returnflag, ver AS canonical FROM (
      SELECT l_suppkey, l_returnflag, ver,
             row_number() OVER (PARTITION BY l_suppkey, l_returnflag
                                ORDER BY qty DESC, line DESC, rev DESC) AS rn
      FROM (
        SELECT l_suppkey, l_returnflag, CAST(l_quantity AS INT) AS qty,
               l_linenumber AS line, CAST(l_orderkey % 5 AS INT) AS rev,
               CAST(l_quantity AS INT) || '.' || l_linenumber || '-' ||
                 CAST(l_orderkey % 5 AS VARCHAR) AS ver
        FROM lineitem))
    WHERE rn = 1
    """,
    doc="W3 newest-stream canonical fix (rhel/parser.py:596-599): top-1 by "
        "dpkg-version order per (pkg, platform); Spark sorts by the dpkg "
        "sort-key encoding (F2), oracle by the equivalent numeric tuple",
    tags=("window", "udf"),
)
def w3(spark, sf_dir):
    from vunnel_spark.functions.versions import dpkg_sort_key

    li = t(spark, sf_dir, "lineitem")
    ver = F.concat_ws(
        "-",
        F.concat_ws(".", F.col("l_quantity").cast("int"), F.col("l_linenumber")),
        (F.col("l_orderkey") % 5).cast("string"),
    )
    return (
        li.withColumn("ver", ver)
        .withColumn("_vkey", dpkg_sort_key(F.col("ver")))
        .groupBy("l_suppkey", "l_returnflag")
        .agg(F.max_by("ver", F.col("_vkey")).alias("canonical"))
    )


@register(
    "w4_fill_down",
    """
    SELECT o_orderkey, o_custkey,
           last_value(marker IGNORE NULLS) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 5 = 0 THEN 'hdr-' || CAST(o_orderkey AS VARCHAR) END AS marker
      FROM orders)
    """,
    doc="W4 DSA header fill-down (debian/parser.py:231-239): "
        "last(ignorenulls) over rowsBetween(unboundedPreceding, 0), "
        "partitioned so no single task sorts the world",
    tags=("window",),
)
def w4(spark, sf_dir):
    from vunnel_spark.operators.windows import fill_down

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.when(
            F.col("o_orderkey") % 5 == 0,
            F.concat(F.lit("hdr-"), F.col("o_orderkey").cast("string")),
        ).alias("marker"),
    )
    filled = fill_down(orders, ["marker"], ["o_orderkey"], partition_by=["o_custkey"])
    return filled.select("o_orderkey", "o_custkey", F.col("marker").alias("filled"))


@register(
    "w6_global_fill_down",
    """
    SELECT o_orderkey,
           last_value(marker IGNORE NULLS) OVER (
             ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0
                  THEN 'hdr-' || CAST(o_orderkey AS VARCHAR) END AS marker
      FROM orders)
    """,
    doc="EXACT GLOBAL fill-down without a global window "
        "(operators/windows.py fill_down_global — the r9 replacement for "
        "the unpartitioned-window API footgun the r8 verdict flagged): "
        "the same last_value(IGNORE NULLS) OVER (ORDER BY ...) semantics "
        "the oracle states, realized as the distributed two-level carry — "
        "per-bucket fill over order-aligned key ranges, one-row-per-bucket "
        "last-non-null reduction, tiny carry cumsum (the only "
        "unpartitioned window, #buckets rows), broadcast join back, "
        "coalesce.  Sparse markers (1/97) force carries across MANY empty "
        "buckets, so the bucket-boundary logic is value-gated, not just "
        "unit-tested.  Scale: no full-frame single-partition stage — the "
        "same discipline as x11/o3",
    tags=("window",),
)
def w6(spark, sf_dir):
    from vunnel_spark.operators.windows import fill_down_global

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 97 == 0,
            F.concat(F.lit("hdr-"), F.col("o_orderkey").cast("string")),
        ).alias("marker"),
    )
    filled = fill_down_global(orders, ["marker"], "o_orderkey", bucket_size=500)
    return filled.select("o_orderkey", F.col("marker").alias("filled"))


@register(
    "w5_latest_entry_top1",
    """
    SELECT source, doc_id, n_chars FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
    WHERE rn = 1
    """,
    doc="W5 newest listing entry per schema version (distribution.py:64-83): "
        "top-1 per group, deterministic tie-break",
    tags=("window",),
)
def w5(spark, sf_dir):
    from vunnel_spark.operators.windows import top_k_per_group

    docs = t(spark, sf_dir, "documents")
    return top_k_per_group(
        docs, ["source"], [F.col("n_chars").desc(), F.col("doc_id")], k=1
    ).select("source", "doc_id", "n_chars")


@register(
    "o4_topk_per_group",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber, price, rank FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber,
             round(l_extendedprice, 2) AS price,
             row_number() OVER (PARTITION BY l_suppkey
                                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rank
      FROM lineitem)
    WHERE rank <= 3
    """,
    doc="O4 general top-k per group (distribution.py:64-71 generalized): "
        "row_number window, k=3 — at scale AQE splits skewed partitions",
    tags=("window", "topk"),
)
def o4(spark, sf_dir):
    from vunnel_spark.operators.windows import top_k_per_group

    li = t(spark, sf_dir, "lineitem")
    return top_k_per_group(
        li,
        ["l_suppkey"],
        [F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")],
        k=3,
    ).select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price"),
        "rank",
    )


@register(
    "o1_rpm_order_sort",
    """
    SELECT ver, rank FROM (
      SELECT ver, row_number() OVER (ORDER BY qty, line, (rc = 0), rc, okey) AS rank
      FROM (
        SELECT CAST(l_quantity AS INT) AS qty, l_linenumber AS line,
               CAST(l_orderkey % 4 AS INT) AS rc, l_orderkey AS okey,
               CAST(l_quantity AS INT) || '.' || l_linenumber ||
                 CASE WHEN l_orderkey % 4 = 0 THEN ''
                      ELSE '~rc' || CAST(l_orderkey % 4 AS VARCHAR) END AS ver
        FROM lineitem WHERE l_suppkey = 1))
    WHERE rank <= 50
    """,
    doc="O1 full custom-comparator sort ascending (rhel/parser.py:584-585 "
        "cmp_to_key(rpmvercmp)): orderBy the encoded key — Spark cannot "
        "sort by comparator, the order-preserving key encoding is THE "
        "mechanism; oracle sorts by the equivalent numeric tuple",
    tags=("topk", "udf"),
)
def o1(spark, sf_dir):
    from vunnel_spark.functions.versions import rpm_sort_key

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") == 1)
    ver = F.concat(
        F.col("l_quantity").cast("int").cast("string"),
        F.lit("."),
        F.col("l_linenumber").cast("string"),
        F.when(F.col("l_orderkey") % 4 == 0, F.lit("")).otherwise(
            F.concat(F.lit("~rc"), (F.col("l_orderkey") % 4).cast("string"))
        ),
    )
    keyed = li.select(ver.alias("ver"), F.col("l_orderkey").alias("okey")).withColumn(
        "_vkey", rpm_sort_key(F.col("ver"))
    )
    # Top-50 via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps, no single-partition sort of the full version frame — 600k
    # rows at sf0.1, 60M at 100x), THEN rank just the 50 survivors by
    # folding them into one sorted array (struct field order = the sort
    # key) and posexploding — no WindowExec in the plan at all.
    top = keyed.orderBy(F.col("_vkey"), F.col("okey")).limit(50)
    packed = top.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_vkey"), F.col("okey"), F.col("ver")))
        ).alias("xs")
    )
    return packed.select(F.posexplode("xs").alias("i", "s")).select(
        F.col("s.ver").alias("ver"), (F.col("i") + 1).cast("int").alias("rank")
    )


@register(
    "o2_fixedin_deterministic_order",
    """
    SELECT vuln_id,
           string_agg(name || ':' || ver, '|' ORDER BY name, ver) AS fixed_csv
    FROM (
      SELECT DISTINCT 'CVE-' || CAST(l_orderkey % 300 AS VARCHAR) AS vuln_id,
             'pkg' || CAST(l_partkey % 20 AS VARCHAR) AS name,
             CAST(CAST(l_quantity AS INT) AS VARCHAR) || '.' ||
               CAST(l_linenumber AS VARCHAR) AS ver
      FROM lineitem)
    GROUP BY vuln_id
    """,
    doc="O2 deterministic FixedIn ordering as a standalone contract "
        "(reference emits FixedIn sorted by package so repeated runs are "
        "byte-identical, rhel/parser.py:996-1000): distinct entries fold "
        "into ONE canonical string per vuln via sort_array(collect_list("
        "struct)) — the value hash fails if ordering ever depends on "
        "input partitioning or arrival order",
    tags=("agg", "window"),
)
def o2(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    entries = li.select(
        F.concat(F.lit("CVE-"), (F.col("l_orderkey") % 300).cast("string")).alias(
            "vuln_id"
        ),
        F.concat(F.lit("pkg"), (F.col("l_partkey") % 20).cast("string")).alias("name"),
        F.concat_ws(
            ".", F.col("l_quantity").cast("int"), F.col("l_linenumber")
        ).alias("ver"),
    ).distinct()
    # Order-insensitivity is guaranteed by array_sort over the collected
    # structs, not by plan shape; the adversarial repartition(7, "ver")
    # that used to sit here as an in-plan proof device was a pure-extra
    # exchange AND a 7-way parallelism ceiling on the partial-aggregate
    # stage (the whole distinct output flowed through 7 tasks at every
    # scale — guide §2.4).  The proof lives in
    # tests/test_windows_order.py::test_o2_partitioning_invariant, which
    # pins the registered plan's result against the adversarially
    # repartitioned variant.
    folded = entries.groupBy("vuln_id").agg(
        F.array_sort(F.collect_list(F.struct("name", "ver"))).alias("fi")
    )
    return folded.select(
        "vuln_id",
        F.array_join(
            F.transform("fi", lambda s: F.concat_ws(":", s.getField("name"), s.getField("ver"))),
            "|",
        ).alias("fixed_csv"),
    )


@register(
    "o3_sorted_listing",
    """
    SELECT fname, row_number() OVER (ORDER BY fname) AS pos FROM (
      SELECT DISTINCT 'results/' || replace(p_brand, ' ', '') || '/' ||
             CAST(p_partkey % 100 AS VARCHAR) || '.json' AS fname
      FROM part)
    """,
    doc="O3 sorted filename listing for stable checksums "
        "(workspace.py:268-284; rhel/parser.py:1018): deterministic listing "
        "order is what makes the digest-of-digests reproducible — the "
        "emitted position makes the sort itself gate-verified, not just the "
        "set of names.  Scale: the naive global row_number is a "
        "single-partition sort of the whole listing (millions of files on "
        "a 100 TB store); this plan is the x11 two-level prefix sum "
        "instead — fixed-length fname PREFIXES make order-aligned buckets "
        "(prefix(a) < prefix(b) implies a < b), the rank windows per "
        "bucket, and each bucket's exclusive offset comes from a tiny "
        "bucket-count aggregate (rows = #buckets) broadcast back",
    tags=("topk",),
)
def o3(spark, sf_dir):
    from pyspark.sql import Window

    names = (
        t(spark, sf_dir, "part")
        .select(
            F.concat(
                F.lit("results/"),
                F.replace(F.col("p_brand"), F.lit(" "), F.lit("")),
                F.lit("/"),
                (F.col("p_partkey") % 100).cast("string"),
                F.lit(".json"),
            ).alias("fname")
        )
        .distinct()
        # order-aligned bucket: a fixed-length prefix (here through the
        # provider directory) — at a real 100 TB store, size the prefix
        # so buckets hold ~1e6 names each
        .withColumn("bucket", F.substring("fname", 1, 16))
    )
    w_local = Window.partitionBy("bucket").orderBy("fname")
    local = names.withColumn("local_pos", F.row_number().over(w_local))
    # tiny frame: one row per bucket — its global window sorts #buckets
    # rows, never #files rows
    w_bucket = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        names.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("before", F.coalesce(F.sum("n").over(w_bucket), F.lit(0)))
        .select("bucket", "before")
    )
    return (
        local.join(F.broadcast(offsets), "bucket")
        .select(
            "fname",
            (F.col("before") + F.col("local_pos")).cast("int").alias("pos"),
        )
    )


@register(
    "o5_release_order",
    """
    SELECT release, row_number() OVER (ORDER BY major, minor) AS pos FROM (
      SELECT DISTINCT 'v' || CAST(n_nationkey % 4 AS VARCHAR) || '.' ||
               CAST(n_nationkey AS VARCHAR) AS release,
             n_nationkey % 4 AS major, n_nationkey AS minor
      FROM nation)
    """,
    doc="O5 release-sorted processing order (alpine/parser.py:201): releases "
        "sort NUMERICALLY by (major, minor) — v3.10 after v3.9, where a "
        "lexicographic sort would invert them; the emitted position verifies "
        "the numeric ordering end-to-end",
    tags=("topk",),
)
def o5(spark, sf_dir):
    from pyspark.sql import Window

    rel = (
        t(spark, sf_dir, "nation")
        .select(
            F.concat(
                F.lit("v"), (F.col("n_nationkey") % 4).cast("string"),
                F.lit("."), F.col("n_nationkey").cast("string"),
            ).alias("release"),
            (F.col("n_nationkey") % 4).alias("major"),
            F.col("n_nationkey").alias("minor"),
        )
        .distinct()
    )
    return (
        rel.withColumn("pos", F.row_number().over(Window.orderBy("major", "minor")))
        .select("release", "pos")
    )
