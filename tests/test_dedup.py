"""Dedup / similarity operator behavior tests: planted duplicates must be
found, LSH recall vs the exact baseline must clear a floor, and the
candidate-only verification path must not regress pair quality.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vunnel_spark.session import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    near = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" spark")).alias("text"),
    )
    return base.unionByName(near).cache()


def planted_pairs(df):
    return {
        (r.doc_id, r.doc_id + 1_000_000)
        for r in df.filter(F.col("doc_id") < 1_000_000)
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id")
        .collect()
    }


def test_exact_dedup_finds_planted_copies(spark, sf_dir):
    from vunnel_spark.operators.dedup import exact_dedup

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = base.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    n_base = base.count()
    n_dup = dups.count()
    groups = exact_dedup(base.unionByName(dups))
    assert groups.count() == n_base  # one group per distinct text
    assert groups.filter(F.col("n_copies") == 2).count() == n_dup


def test_minhash_lsh_recall_vs_exact(spark, docs):
    from vunnel_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert exact, "no exact near-dup pairs — planted dups missing?"
    lsh = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, verify_threshold=0.8).collect()}
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} < 0.9 ({len(exact)} exact pairs)"
    # verification must keep precision exact: every verified pair is real
    assert lsh <= exact


def test_simhash_finds_planted_near_dups(spark, docs):
    from vunnel_spark.operators.dedup import simhash_pairs

    found = {(r.id_a, r.id_b) for r in simhash_pairs(docs, max_hamming=3).collect()}
    planted = planted_pairs(docs)
    hit = len(found & planted) / len(planted)
    # one appended word on a >=20-word doc flips few simhash bits
    assert hit >= 0.7, f"simhash found only {hit:.2f} of planted near-dups"


def test_embedding_dup_pairs_find_planted(spark, sf_dir):
    from vunnel_spark.operators.dedup import embedding_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.02 + 0.005).alias("embedding"),
    )
    n_planted = planted.count()
    pairs = embedding_dup_pairs(emb.unionByName(planted), threshold=0.9)
    rows = pairs.collect()
    assert rows, "no embedding near-dups found"
    found = {(r.id_a, r.id_b) for r in rows}
    expect = {(r.vec_id, r.vec_id + 1_000_000) for r in emb.filter(F.col("vec_id") % 5 == 0).collect()}
    hit = len(found & expect) / n_planted
    assert hit >= 0.5, f"embedding LSH found only {hit:.2f} of planted pairs"
    # every reported pair must genuinely clear the threshold
    assert all(r.cos_sim >= 0.9 for r in rows)


def test_lsh_topk_recall(spark, sf_dir):
    from vunnel_spark.operators.similarity import brute_force_topk, lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(emb, queries, k=5, n_bits=3, n_tables=16).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.8, f"ANN recall {recall:.2f} < 0.8"


def test_semantic_dedup_keep_lowest_and_best_match(spark):
    """Unit semantics: within a cell, every >=threshold pair marks the
    HIGHER id dropped; a doc near two kept docs reports its best match."""
    from vunnel_spark.operators.dedup import semantic_dedup

    rows = [
        (1, [1.0, 0.0]),      # kept
        (2, [0.999, 0.01]),   # dup of 1
        (3, [0.0, 1.0]),      # kept, different direction
        (4, [0.97, 0.08]),    # near 1 AND 2; best match decides kept_id
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # one centroid: everything lands in a single cell -> pure semantics test
    out = {
        r.dropped_id: (r.kept_id, r.cos_sim)
        for r in semantic_dedup(df, [[0.5, 0.5]], threshold=0.95).collect()
    }
    assert set(out) == {2, 4}
    assert out[2][0] == 1
    # 4's best match is whichever of 1/2 has higher cosine (tie -> lower id)
    assert out[4][0] in (1, 2) and out[4][1] >= 0.95
    # 1 and 3 never dropped (cos(1,3)=0)
