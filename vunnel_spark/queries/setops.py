"""Set operations (SURVEY §2.8 U1-U7).

Anti-join reconciliation, array-level set algebra, union-distinct merges.
Scale notes: U1's two anti-joins reduce both sides to distinct keys before
shuffling; array ops are per-row JVM expressions (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vunnel_spark.queries._util import t
from vunnel_spark.registry import register


@register(
    "u1_two_sided_reconciliation",
    """
    SELECT o_orderkey AS rec_key, 'no_lineitems' AS side
    FROM orders
    WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    UNION ALL
    SELECT DISTINCT l_orderkey AS rec_key, 'orphan_lineitem' AS side
    FROM lineitem
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
    """,
    doc="U1 API-set vs FS-set reconciliation (rhel/parser.py:319-346): "
        "left_anti in both directions; delete/warn sides labeled",
    tags=("setop", "join"),
)
def u1(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("rec_key"))
    li = t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("rec_key")).distinct()
    no_li = orders.join(li, "rec_key", "left_anti").withColumn("side", F.lit("no_lineitems"))
    orphan = li.join(orders, "rec_key", "left_anti").withColumn(
        "side", F.lit("orphan_lineitem")
    )
    return no_li.unionByName(orphan)


@register(
    "u2_flatten_collect_except",
    """
    WITH per_nation AS (
      SELECT c_nationkey, list_sort(list(DISTINCT c_mktsegment)) AS segs
      FROM customer GROUP BY c_nationkey
    ), all_segs AS (
      SELECT list_sort(list(DISTINCT c_mktsegment)) AS all_s FROM customer
    )
    SELECT c_nationkey, array_to_string(segs, '|') AS segs,
           COALESCE(array_to_string(
             list_sort(list_filter(all_s, s -> NOT list_contains(segs, s))), '|'), '')
             AS missing_segs
    FROM per_nation CROSS JOIN all_segs
    """,
    doc="U2 union of per-platform sets minus own (rhel/parser.py:521): "
        "flatten(collect_set) + array_except; the global set is a 1-row "
        "aggregate cross-joined (broadcast) — no per-row recompute. "
        "Serialized '|'-joined (gate canonicalizer needs hashable scalars)",
    tags=("setop", "agg"),
)
def u2(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    per_nation = cust.groupBy("c_nationkey").agg(
        F.array_sort(F.collect_set("c_mktsegment")).alias("segs")
    )
    all_segs = cust.agg(F.array_sort(F.collect_set("c_mktsegment")).alias("all_s"))
    return (
        per_nation.crossJoin(F.broadcast(all_segs))
        .select(
            "c_nationkey",
            F.concat_ws("|", "segs").alias("segs"),
            F.concat_ws(
                "|", F.array_sort(F.array_except(F.col("all_s"), F.col("segs")))
            ).alias("missing_segs"),
        )
    )


@register(
    "u3_array_union_merge",
    """
    SELECT p_partkey,
           array_to_string(list_sort(list_distinct(
             list_concat(string_split(p_name, ' '), [p_brand]))), '|') AS merged
    FROM part
    """,
    doc="U3 reference-url set-union merge (nvd/manager.py:328-335): "
        "array_union dedup, sorted for determinism. Serialized '|'-joined "
        "(gate canonicalizer needs hashable scalars)",
    tags=("setop", "scalar"),
)
def u3(spark, sf_dir):
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.concat_ws(
            "|", F.array_sort(F.array_union(F.split("p_name", " "), F.array(F.col("p_brand"))))
        ).alias("merged"),
    )


@register(
    "u5_union_distinct_ids",
    """
    SELECT o_orderkey AS rec_key FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT l_orderkey AS rec_key FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="U5/U6 changed-id union across strategies (tool/fixdate/finder.py:"
        "205-209): union().distinct()",
    tags=("setop",),
)
def u5(spark, sf_dir):
    a = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("rec_key"))
    )
    b = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("rec_key"))
    )
    return a.union(b).distinct()


@register(
    "u4_union_concat",
    """
    SELECT l_orderkey AS rec, l_partkey AS pkg, 'affected' AS state
    FROM lineitem WHERE l_returnflag = 'A'
    UNION ALL
    SELECT l_orderkey, l_partkey, 'out_of_support'
    FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="U4 affected ∪ out-of-support list concat (rhel/parser.py:752): "
        "plain unionByName, duplicates preserved — the two lists are "
        "disjoint by construction and the consumer wants both",
    tags=("setop",),
)
def u4(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_orderkey").alias("rec"),
        F.col("l_partkey").alias("pkg"),
        F.lit("affected").alias("state"),
    )
    b = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("rec"),
        F.col("l_partkey").alias("pkg"),
        F.lit("out_of_support").alias("state"),
    )
    return a.unionByName(b)
