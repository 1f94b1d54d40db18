"""End-to-end provider pipelines as registered queries: the composed
DAG — store upsert, override patch, synthesis, full re-emit — runs under
the driver's correctness gate, not just in pytest golden tests.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from vunnel_spark.queries._util import t
from vunnel_spark.registry import register


@register(
    "nvd1_full_corpus_reemit",
    """
    SELECT 'cve-' || CAST(o_orderkey AS VARCHAR) AS identifier,
           CASE WHEN o_orderkey % 7 = 0 THEN 'OVR'
                WHEN o_orderkey % 5 = 0 THEN 'DELTA'
                ELSE o_orderpriority END AS severity,
           CASE WHEN o_orderkey % 5 = 0 THEN 'delta' ELSE 'base' END ||
             CASE WHEN o_orderkey % 7 = 0 THEN '|ovr-ref' ELSE '' END AS refs,
           (o_orderkey % 7 = 0) AS was_overridden
    FROM orders
    UNION ALL
    SELECT 'cve-x' || CAST(o_orderkey AS VARCHAR), 'OVR', 'ovr-ref', TRUE
    FROM orders WHERE o_orderkey % 13 = 0
    """,
    doc="NVD provider lifecycle end-to-end (nvd/manager.py:103-159 + "
        "161-186 + 304-339; pipelines/nvd.py): an initial full sync is "
        "upserted into the input store, then an incremental delta run "
        "re-emits the FULL corpus — delta rows replace stored records "
        "last-wins, overrides patch severity and set-union refs on every "
        "emitted record, and override-only CVEs are synthesized.  The "
        "oracle states the expected final corpus; a pipeline that emitted "
        "only the delta, dropped frozen records, or skipped synthesis "
        "row-count-mismatches",
    tags=("pipeline", "join", "sink", "incremental"),
)
def nvd1(spark, sf_dir):
    from vunnel_spark.pipelines.nvd import nvd_pipeline, upsert_input

    wd = tempfile.mkdtemp(prefix="nvd1_")
    o = t(spark, sf_dir, "orders")
    initial = o.select(
        F.concat(F.lit("CVE-"), F.col("o_orderkey").cast("string")).alias("cve_id"),
        F.col("o_orderpriority").alias("severity"),
        F.lit("rec").alias("description"),
        F.col("o_orderdate").cast("timestamp").alias("last_modified"),
        F.array(F.lit("base")).alias("refs"),
    )
    upsert_input(spark, os.path.join(wd, "input"), initial)
    delta = (
        o.filter(F.col("o_orderkey") % 5 == 0)
        .select(
            F.concat(F.lit("CVE-"), F.col("o_orderkey").cast("string")).alias("cve_id"),
            F.lit("DELTA").alias("severity"),
            F.lit("rec-delta").alias("description"),
            (F.col("o_orderdate") + F.expr("INTERVAL 1000 DAYS"))
            .cast("timestamp")
            .alias("last_modified"),
            F.array(F.lit("delta")).alias("refs"),
        )
    )
    overrides = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.concat(F.lit("CVE-"), F.col("o_orderkey").cast("string")).alias("cve_id"),
        F.lit("OVR").alias("severity"),
        F.array(F.lit("ovr-ref")).alias("extra_refs"),
    ).unionByName(
        o.filter(F.col("o_orderkey") % 13 == 0).select(
            F.concat(F.lit("CVE-X"), F.col("o_orderkey").cast("string")).alias("cve_id"),
            F.lit("OVR").alias("severity"),
            F.array(F.lit("ovr-ref")).alias("extra_refs"),
        )
    )
    out = nvd_pipeline(spark, delta, wd, overrides=overrides)
    return out.select(
        "identifier",
        F.col("item.severity").alias("severity"),
        F.concat_ws("|", F.col("item.refs")).alias("refs"),
        F.col("item.was_overridden").alias("was_overridden"),
    )
