"""Deduplication operators for large document corpora.

Five families, ordered by cost:

  exact_dedup          hash-groupBy on content (one shuffle on a hash key)
  fingerprint_dedup    rolling-hash fingerprint groupBy (cheap candidate)
  ngram_jaccard_pairs  exact shingle-overlap join (quadratic within shingle
                       buckets — the *verification* path)
  minhash_lsh_pairs    MinHash + banded LSH (the 100 TB path: candidate
                       pairs come from equi-joins on band buckets, never a
                       full cross join)
  simhash_pairs        64-bit SimHash + hamming-ball bucketing
  embedding_dup_pairs  cosine near-dup over embeddings within LSH buckets

Scale notes: every operator shuffles on a *derived small key* (hash,
band bucket, shingle) and never materializes the cross product.  Skewed
shingles (stopword-only shingles at 100 TB) are handled by a frequency cap:
shingles appearing in more than ``max_shingle_freq`` docs are dropped from
candidate generation (they only generate noise pairs), mirroring the
standard suffix-filtering trick from the MinHash/LSH literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each identical-content group.

    groupBy on sha256(content) — the content itself never shuffles twice;
    at 100 TB, group on the 32-byte digest, not the raw text.
    """
    return (
        df.withColumn("_h", F.sha2(F.col(content_col), 256))
        .groupBy("_h")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("_h")
    )


def duplicate_groups(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, keep_id) mapping: every doc points at its group representative."""
    w = Window.partitionBy("_h")
    return (
        df.withColumn("_h", F.sha2(F.col(content_col), 256))
        .withColumn("keep_id", F.min(id_col).over(w))
        .withColumn("is_duplicate", F.col(id_col) != F.col("keep_id"))
        .drop("_h")
    )


def _word_shingles(df: DataFrame, content_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) distinct word-k-gram rows, built with JVM expressions.

    transform over a sequence of start positions -> slice -> concat; no UDF.
    """
    words = F.split(F.trim(F.col(content_col)), r"\s+")
    n = F.size(words)
    starts = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingles = F.when(n < k, F.array(F.concat_ws(" ", words))).otherwise(
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(shingles)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over word-k-gram shingle sets.

    Pair generation is an equi-join on shingle (docs sharing zero shingles
    never meet).  ``max_shingle_freq`` drops ubiquitous shingles before the
    self-join — at scale this is what keeps the join linear-ish.
    """
    sh = _word_shingles(df, content_col, id_col, k)
    if max_shingle_freq:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_f"))
        sh = sh.join(freq.filter(F.col("_f") <= max_shingle_freq), "shingle").drop("_f")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """(id, sig: array<bigint>) MinHash signatures.

    Permutation i is xxhash64(shingle, seed=i) — deterministic, seed-driven,
    computed JVM-side.  min per seed via groupBy(min) over an exploded
    (id, seed, hash) frame: one shuffle keyed on id.
    """
    sh = _word_shingles(df, content_col, id_col, k)
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    hashed = sh.select(
        "id",
        F.explode(seeds).alias("seed"),
        F.xxhash64(F.col("shingle"), F.col("seed")).alias("h"),
    )
    # two-level agg: per (id, seed) min, then assemble ordered signature
    return (
        hashed.groupBy("id", "seed")
        .agg(F.min("h").alias("mh"))
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("seed", "mh"))).alias("_s"))
        .select("id", F.transform("_s", lambda s: s["mh"]).alias("sig"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    verify_threshold: float | None = 0.5,
) -> DataFrame:
    """MinHash + banded LSH candidate pairs, optionally Jaccard-verified.

    Band bucket key = hash(band_index, signature slice); candidates are
    pairs sharing >=1 bucket — generated by a self-equi-join on the bucket
    key (shuffle on bucket, never a cross join).  With 64 hashes / 16 bands
    (rows=4) the S-curve crosses ~0.5 Jaccard.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, content_col, id_col, k, num_hashes)
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    buckets = sig.select(
        "id",
        F.explode(band_idx).alias("band"),
        F.col("sig"),
    ).select(
        "id",
        "band",
        F.xxhash64(
            F.col("band"),
            F.concat_ws(",", F.transform(
                F.slice(F.col("sig"), F.col("band") * rows_per_band + 1, rows_per_band),
                lambda x: x.cast("string"),
            )),
        ).alias("bucket"),
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    if verify_threshold is None:
        return cand
    verified = ngram_jaccard_pairs(df, content_col, id_col, k, verify_threshold)
    return cand.join(verified, ["id_a", "id_b"]).select("id_a", "id_b", "jaccard")


def simhash_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_tables: int = 4,
) -> DataFrame:
    """64-bit SimHash near-dup pairs via banded bucketing.

    SimHash built with JVM expressions: explode words -> xxhash64 ->
    per-bit +/-1 sums -> sign bits reassembled.  Pair generation buckets on
    each of ``n_tables`` 16-bit slices (a pair within hamming distance 3 of
    a 64-bit key agrees exactly on at least one of 4 slices — pigeonhole),
    then verifies true hamming distance with bit_count(xor).
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(content_col)), r"\s+")).alias("w"),
    ).withColumn("h", F.xxhash64("w"))
    bits = words.select("id", "h", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"))
    bitsum = (
        bits.withColumn(
            "v",
            F.when(F.shiftright(F.col("h"), F.col("bit")).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        .groupBy("id", "bit")
        .agg(F.sum("v").alias("s"))
        .withColumn("bitval", F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)))
    )
    sim = bitsum.groupBy("id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bit", "bitval"))),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.shiftleft(x["bitval"].cast("long"), x["bit"]),
        ).alias("simhash")
    )
    slices = sim.select(
        "id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_tables - 1))).alias("t"),
    ).withColumn(
        "slice",
        F.shiftright(F.col("simhash"), F.col("t") * 16).bitwiseAND(F.lit(0xFFFF)),
    )
    a, b = slices.alias("a"), slices.alias("b")
    return (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
