"""Sink/state operators as registered queries: each writes to a unique
temp location, reads back, and returns a verifiable frame — proving the
write path under the driver's correctness gate, not just in pytest.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from vunnel_spark.queries._util import t
from vunnel_spark.registry import register


@register(
    "s12_sink_roundtrip",
    """
    SELECT o_orderkey AS ident, o_orderstatus AS status,
           round(o_totalprice, 2) AS price
    FROM orders
    """,
    doc="S12/S13 envelope sink round-trip (result.py:86-302): dedup-on-write"
        " -> partitioned parquet (atomic swap) -> re-read; the oracle checks"
        " the round-tripped CONTENT equals the source — a lossy or "
        "double-writing sink hash-mismatches",
    tags=("sink",),
)
def s12(spark, sf_dir):
    from vunnel_spark.sinks import EnvelopeWriter

    out = os.path.join(tempfile.mkdtemp(prefix="s12_"), "results")
    orders = t(spark, sf_dir, "orders")
    writer = EnvelopeWriter(out, key="ident", dedup="last_wins", order_col="ident")
    writer.write(
        orders.select(
            F.col("o_orderkey").alias("ident"),
            F.col("o_orderstatus").alias("status"),
            F.round("o_totalprice", 2).alias("price"),
        )
    )
    return writer.read(spark)


@register(
    "i4_first_observed_merge",
    """
    SELECT DISTINCT l_orderkey AS vuln, l_partkey AS pkg,
           DATE '2026-08-13' AS first_observed
    FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="I4 first-observed merge-on-miss state (tool/fixdate/"
        "first_observed.py:35-63): two merges run back-to-back with "
        "different 'today' values — the oracle date only matches if the "
        "second merge did NOT move existing keys (idempotence under the "
        "correctness gate)",
    tags=("sink", "incremental"),
)
def i4(spark, sf_dir):
    from vunnel_spark.sinks import first_observed_merge

    state = os.path.join(tempfile.mkdtemp(prefix="i4_"), "state")
    keys = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("vuln"), F.col("l_partkey").alias("pkg"))
        .distinct()
    )
    first_observed_merge(spark, state, keys, ["vuln", "pkg"], today="2026-08-13")
    # second run with a later date: must be a no-op for existing keys
    merged = first_observed_merge(spark, state, keys, ["vuln", "pkg"], today="2027-01-01")
    return merged.select("vuln", "pkg", "first_observed")
