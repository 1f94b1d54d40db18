"""Similarity-search queries over the ``embeddings`` table
(LLM-pipeline surface): brute-force cosine top-k as the correctness
baseline, LSH-bucketed ANN as the scale path, and a recall query binding
the two together.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vunnel_spark.queries._util import t
from vunnel_spark.registry import register

_N_QUERIES = 8  # small query set; corpus side stays the full table
_K = 5


@register(
    "n1_ann_bruteforce_topk",
    f"""
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS cos_sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) DESC,
                        c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {_N_QUERIES})
    WHERE rank <= {_K}
    """,
    doc="Brute-force cosine top-k (operators/similarity.py brute_force_topk):"
        " broadcast queries x corpus scan, window-ranked; the documented "
        "recall baseline — production path is n2",
    tags=("similarity",),
)
def n1(spark, sf_dir):
    from vunnel_spark.operators.similarity import brute_force_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return brute_force_topk(emb, queries, k=_K).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


@register(
    "n2_ann_lsh_topk",
    None,  # bucket keys derive from xxhash64 hyperplanes — not SQL-portable
    doc="LSH-bucketed ANN top-k (operators/similarity.py lsh_topk): "
        "sign-bit hyperplane buckets, candidates from bucket collisions "
        "only — each query touches ~1/2^bits of the corpus per table",
    tags=("similarity",),
)
def n2(spark, sf_dir):
    from vunnel_spark.operators.similarity import lsh_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    # 3 bits x 16 tables: the driver corpus is near-orthogonal random
    # vectors (max pair cosine ~0.43), so buckets must stay coarse for
    # recall ~0.95; clustered real-world embeddings support 8+ bits with
    # far fewer tables.  Recall is measured by n3 and gated in tests.
    return lsh_topk(emb, queries, k=_K, n_bits=3, n_tables=16).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


@register(
    "n4_ann_ivf_topk",
    None,  # cells come from a fitted k-means model — not SQL-portable
    doc="IVF ANN top-k (operators/similarity.py ivf_topk): k-means coarse "
        "quantizer (pyspark.ml, trained distributed), centroids shipped as "
        "plan literals; corpus lives in its nearest cell, queries probe "
        "nprobe cells — each query touches ~nprobe/nlist of the corpus",
    tags=("similarity",),
)
def n4(spark, sf_dir):
    from vunnel_spark.operators.similarity import ivf_topk, train_ivf_centroids

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    cents = train_ivf_centroids(emb, nlist=8)
    return ivf_topk(emb, queries, cents, k=_K, nprobe=4).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


_IVF_DUP_BASE = 1_000_000


@register(
    "n5_ann_ivf_dup_retrieval",
    f"""
    SELECT vec_id + {_IVF_DUP_BASE} AS query_id,
           vec_id AS neighbor_id,
           round(list_cosine_similarity(
             list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.02 + 0.005),
             CAST(embedding AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings WHERE vec_id % 5 = 0
    """,
    doc="IVF retrieval gate: planted near-dups (same construction as d7) "
        "must come back as their query's rank-1 neighbor through the cell "
        "probe — near-identical vectors quantize into the same (or an "
        "adjacent probed) cell, so the exact planted-pair set is the "
        "oracle; a miss here means the quantizer or probe path broke",
    tags=("similarity",),
)
def n5(spark, sf_dir):
    from vunnel_spark.operators.similarity import ivf_topk, train_ivf_centroids

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + _IVF_DUP_BASE).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.02 + 0.005).alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    cents = train_ivf_centroids(corpus, nlist=8)
    return (
        ivf_topk(corpus, planted, cents, k=1, nprobe=4)
        .filter(F.col("cos_sim") >= 0.9)
        .select("query_id", "neighbor_id", "cos_sim")
    )


@register(
    "n6_ann_lsh_dup_retrieval",
    f"""
    SELECT vec_id + {_IVF_DUP_BASE} AS query_id,
           vec_id AS neighbor_id,
           round(list_cosine_similarity(
             list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.02 + 0.005),
             CAST(embedding AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings WHERE vec_id % 5 = 0
    """,
    doc="LSH retrieval gate (mirror of n5's IVF gate): planted near-dups "
        "must come back as their query's rank-1 neighbor through bucket "
        "collisions — a near-identical vector keeps its sign pattern on "
        "every hyperplane except a measure-zero band, so with 3 bits x 16 "
        "tables at least one co-bucket is certain in practice and the "
        "exact planted-pair set is the oracle.  Converts the LSH path "
        "from rows-only to value-verified",
    tags=("similarity",),
)
def n6(spark, sf_dir):
    from vunnel_spark.operators.similarity import lsh_topk

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + _IVF_DUP_BASE).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.02 + 0.005).alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    return (
        lsh_topk(corpus, planted, k=1, n_bits=3, n_tables=16)
        .filter(F.col("cos_sim") >= 0.9)
        .select("query_id", "neighbor_id", "cos_sim")
    )


@register(
    "n3_ann_lsh_recall",
    None,  # derived from n2 (hash-dependent)
    doc="Recall of LSH ANN vs the brute-force baseline per query: "
        "|lsh ∩ exact| / k — the metric that gates any ANN parameter change",
    tags=("similarity",),
)
def n3(spark, sf_dir):
    from vunnel_spark.operators.similarity import brute_force_topk, lsh_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    exact = brute_force_topk(emb, queries, k=_K).select("query_id", "neighbor_id")
    approx = lsh_topk(emb, queries, k=_K, n_bits=3, n_tables=16).select(
        "query_id", "neighbor_id"
    )
    hits = exact.join(approx, ["query_id", "neighbor_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_exact"), 4
            ).alias("recall"),
        )
    )
