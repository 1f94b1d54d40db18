"""o2's deterministic-ordering contract, pinned OUTSIDE the plan.

r15 removed the in-plan adversarial ``repartition(7, "ver")`` from
o2_fixedin_deterministic_order (it was a pure-extra exchange and a 7-way
parallelism ceiling on the partial-aggregate stage at every scale —
guide §2.4).  The property it proved — the folded FixedIn string is
independent of input partitioning and arrival order — is a consequence
of ``array_sort(collect_list(struct))``, and this test pins it by
comparing the registered query against adversarially repartitioned
variants of the same computation.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _fold(entries):
    folded = entries.groupBy("vuln_id").agg(
        F.array_sort(F.collect_list(F.struct("name", "ver"))).alias("fi")
    )
    return folded.select(
        "vuln_id",
        F.array_join(
            F.transform(
                "fi",
                lambda s: F.concat_ws(":", s.getField("name"), s.getField("ver")),
            ),
            "|",
        ).alias("fixed_csv"),
    )


def test_o2_partitioning_invariant(spark, sf_dir):
    from vunnel_spark.registry import all_queries

    registered = all_queries()["o2_fixedin_deterministic_order"](spark, sf_dir)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    entries = li.select(
        F.concat(F.lit("CVE-"), (F.col("l_orderkey") % 300).cast("string")).alias(
            "vuln_id"
        ),
        F.concat(F.lit("pkg"), (F.col("l_partkey") % 20).cast("string")).alias("name"),
        F.concat_ws(
            ".", F.col("l_quantity").cast("int"), F.col("l_linenumber")
        ).alias("ver"),
    ).distinct()

    # the r14-era in-plan adversary: hash-partition by a key unrelated
    # to the aggregation key, at a partition count unrelated to the
    # session's, plus a round-robin variant (arrival-order shuffle)
    for adversary in (
        entries.repartition(7, "ver"),
        entries.repartition(3),
        entries.sort(F.col("ver").desc()),
    ):
        variant = _fold(adversary)
        assert variant.exceptAll(registered).count() == 0
        assert registered.exceptAll(variant).count() == 0
