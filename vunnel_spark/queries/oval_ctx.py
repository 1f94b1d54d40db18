"""E4: OVAL criteria walk with inherited module/arch context.

The reference's Oracle-provider walk (providers/oracle/oval_parser.py:209-277)
threads module-stream and architecture context down criteria branches so a
"PKG is earlier than V" test is attributed to the module/arch of the branch
gating it.  ``operators/oval.py::flatten_criteria_ctx`` is the Spark form
(Arrow-batched mapInPandas UDTF); this module registers the oracle-checked
query over a deterministically synthesized module-stream criteria forest.

Registered in its own later-sorting module so the external gate's pinned
first-50 window (tests/test_plans.py::test_gate_window_composition_stable)
does not shift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vunnel_spark.queries._util import t
from vunnel_spark.registry import register


@register(
    "e4_oval_ctx_flatten",
    """
    WITH base AS (SELECT o_orderkey, o_custkey FROM orders),
    rows_a AS (
      -- pkgA sits in a child group whose own Module criterion OVERRIDES the
      -- group-level module; arch stays NULL (sibling's arch must not leak)
      SELECT CAST(o_orderkey AS VARCHAR) AS doc_id,
             'Oracle Linux 8' AS namespace,
             'pkgA-' || CAST(o_orderkey % 10 AS VARCHAR) AS package,
             '1.' || CAST(o_orderkey % 5 AS VARCHAR) AS version,
             'idm:DL' || CAST(o_custkey % 2 AS VARCHAR) AS module,
             CAST(NULL AS VARCHAR) AS arch
      FROM base
      UNION ALL
      -- pkgB inherits the GROUP-level module (only present on %3 docs) and
      -- its own branch's arch criterion
      SELECT CAST(o_orderkey AS VARCHAR),
             'Oracle Linux 8',
             'pkgB',
             '2.0',
             CASE WHEN o_orderkey % 3 = 0 THEN 'perl:5.26' ELSE NULL END,
             CASE WHEN o_orderkey % 2 = 0 THEN 'x86_64' ELSE 'aarch64' END
      FROM base
    )
    SELECT * FROM rows_a
    """,
    doc="E4 context-inheriting criteria walk (reference "
        "providers/oracle/oval_parser.py:209-277): module/arch criterions "
        "set branch-local context inherited by nested groups but never by "
        "siblings; namespace bubbles up per top-level platform group.  The "
        "tree is synthesized from orders columns so the oracle can state "
        "the exact expected (ns, pkg, ver, module, arch) rows in SQL",
    tags=("explode", "udf", "oval"),
)
def e4(spark, sf_dir):
    from vunnel_spark.operators.oval import flatten_criteria_ctx

    o = t(spark, sf_dir, "orders")
    ns_crit = F.struct(F.lit("Oracle Linux 8 is installed").alias("comment"))
    group_module_crit = F.struct(
        F.lit("Module perl:5.26 is enabled").alias("comment")
    )
    child1 = F.struct(
        F.array(
            F.struct(
                F.concat(
                    F.lit("Module idm:DL"),
                    (F.col("o_custkey") % 2).cast("string"),
                    F.lit(" is enabled"),
                ).alias("comment")
            ),
            F.struct(
                F.concat(
                    F.lit("pkgA-"),
                    (F.col("o_orderkey") % 10).cast("string"),
                    F.lit(" is earlier than 1."),
                    (F.col("o_orderkey") % 5).cast("string"),
                ).alias("comment")
            ),
        ).alias("criterions")
    )
    child2 = F.struct(
        F.array(
            F.struct(
                F.concat(
                    F.lit("Architecture is "),
                    F.when(F.col("o_orderkey") % 2 == 0, "x86_64").otherwise(
                        "aarch64"
                    ),
                ).alias("comment")
            ),
            F.struct(F.lit("pkgB is earlier than 2.0").alias("comment")),
        ).alias("criterions")
    )
    tree = F.to_json(
        F.struct(
            F.lit("AND").alias("operator"),
            F.when(
                F.col("o_orderkey") % 3 == 0,
                F.array(ns_crit, group_module_crit),
            )
            .otherwise(F.array(ns_crit))
            .alias("criterions"),
            F.array(child1, child2).alias("children"),
        )
    )
    docs = o.select(
        F.col("o_orderkey").cast("string").alias("doc_id"), tree.alias("criteria")
    )
    return flatten_criteria_ctx(docs)
