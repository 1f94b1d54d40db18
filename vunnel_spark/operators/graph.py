"""Connected components — turning near-dup pairs into dedup clusters.

The pair generators in ``operators/dedup.py`` emit *edges* (A~B).  A real
dedup decision needs the transitive closure: if A~B and B~C then all three
are one cluster even though A~C was never emitted.  At LLM-corpus scale the
duplicate graph has billions of edges, so the closure must be computed
distributed — this module implements the alternating
**large-star / small-star** algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", ACM SoCC 2014), the standard
trillion-edge formulation also used by GraphFrames:

  large-star  every node points its *larger* neighbors at its minimum
              neighbor (or itself) — flattens high-degree hubs;
  small-star  every node and its smaller neighbors all point at the
              minimum — contracts chains.

Scale properties (the reason this shape and not label-propagation-over-
collect_set):

- each round is a ``groupBy(node).min`` plus an equi-join back on the same
  key — adjacency lists are never collected, so a mega-hub's neighbor set
  never lands on one executor (the min is a partial aggregate);
- converges in O(log n) rounds on any graph; near-dup graphs (clique-ish
  clusters) converge in 2-3;
- lineage is cut every round with ``localCheckpoint`` so the plan depth
  stays O(1) — on a cluster this would be ``checkpoint`` to durable
  storage for fault-tolerance across a long iteration;
- the per-round convergence test is one aggregate action over the (small,
  checkpointed) edge list — the same driver-loop pattern GraphX/Pregel
  uses for iterative algorithms; nothing row-sized ever hits the driver.

Reference parity note: the reference engine (anchore/vunnel) has no graph
operator — this is part of the beyond-reference LLM-pipeline surface, the
step between pair generation (d3/d4/d5/d7) and an actual keep/drop list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """(u,v) edges -> for each node, larger neighbors point at min(Γ∪{u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select("u", F.least("u", "_mn").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """orient edges larger->smaller; node + smaller neighbors point at min."""
    ee = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = ee.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = ee.join(mins, "u").select(F.col("v").alias("n"), "m")
    selfs = mins.select(F.col("u").alias("n"), "m")
    return (
        nbrs.union(selfs)
        .where(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Resolve the undirected graph of ``edges`` into components.

    Returns ``(node, component)`` — one row per distinct node appearing in
    the edge list, where ``component`` is the minimum node id reachable
    from it (a canonical, deterministic cluster representative).

    ``stats``, when given, is filled with ``edges_in`` (distinct input
    edges), ``rounds`` (star iterations run), and ``edges_fixpoint`` —
    the scale-audit instrumentation (scalecurve.py --cc-profile); it
    adds no extra jobs, only records the signatures the loop already
    computes.
    """
    e0 = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).where(F.col("u").isNotNull() & F.col("v").isNotNull())
    nodes = (
        e0.select("u").union(e0.select(F.col("v").alias("u"))).distinct()
    )
    e = e0.where(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=True)
    # edge-set signature: (count, order-insensitive xor of row hashes).
    # bit_xor never overflows (sum of 64-bit hashes would, and Spark 4's
    # ANSI mode makes that an error); edges are distinct so the xor is a
    # proper set signature.  Equal signatures across a round => fixpoint.
    _sig_cols = [
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(u, v))").alias("h"),
    ]
    sig = e.agg(*_sig_cols).first()
    if stats is not None:
        stats["edges_in"] = sig["n"]
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        e2 = (
            _small_star(_large_star(e)).distinct().localCheckpoint(eager=True)
        )
        sig2 = e2.agg(*_sig_cols).first()
        e = e2
        if (sig2["n"], sig2["h"]) == (sig["n"], sig["h"]):
            break
        sig = sig2
    if stats is not None:
        stats["rounds"] = rounds
        stats["edges_fixpoint"] = sig["n"]
    # at fixpoint every edge is (member -> component min); a node can still
    # carry >1 edge if max_iter cut iteration short — min() keeps the
    # result well-defined either way.
    mapping = e.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("component")
    )
    return (
        nodes.select(F.col("u").alias("node"))
        .join(mapping, "node", "left")
        .select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
    )


def transitive_dedup(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Full-corpus keep/drop list from a near-dup pair set.

    A doc is kept iff it is its cluster's canonical representative (the
    minimum id); docs in no pair are singleton clusters and always kept.
    The join against the (tiny) component map broadcasts at corpus scale:
    components ≈ number of duplicated docs, orders of magnitude smaller
    than the corpus.
    """
    cc = connected_components(pairs, pair_a, pair_b)
    return (
        docs.join(
            F.broadcast(cc), docs[id_col] == cc["node"], "left"
        )
        .select(
            docs[id_col],
            (F.col("component").isNull() | (F.col("component") == docs[id_col]))
            .cast("int")
            .alias("keep"),
            F.coalesce("component", docs[id_col]).alias("cluster_id"),
        )
    )
