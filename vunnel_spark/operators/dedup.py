"""Deduplication operators for large document corpora.

Five families, ordered by cost:

  exact_dedup          hash-groupBy on content (one shuffle on a hash key)
  fingerprint_dedup    md5-of-head fingerprint groupBy (cheap candidate)
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


def fingerprint_dedup(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Head-fingerprint dedup: cheap order-sensitive candidate pass.

    Same shape as exact_dedup but keyed on the md5-of-head fingerprint
    (functions/text.py) instead of the full-content digest — groups
    documents sharing the same first 500 chars without shuffling full
    text (the fingerprint is 32 hex bytes regardless of document size).
    """
    from vunnel_spark.functions.text import fingerprint

    return (
        df.withColumn("_fp", fingerprint(F.col(content_col)))
        .groupBy("_fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .withColumnRenamed("_fp", "fingerprint")
    )


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_tables: int = 4,
    n_bits: int = 8,
    dim: int = 64,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within LSH buckets.

    Candidate pairs come from random-hyperplane bucket collisions
    (operators/similarity.py) — a self-equi-join on (table, bucket), never
    a cross join; cosine is then scored only on candidates.

    Same shape discipline as minhash_lsh_pairs: bucket rows carry IDS
    ONLY (the round-11 sf10 push found the old shape — member lists with
    their 64-dim vectors attached — materializes a multi-hundred-MB pair
    array in a single row whenever near-parallel families skew a bucket,
    and OOMs the executor).  Ids group thin, successor pairs emit thin,
    distinct dedups thin; vectors join back for the cosine verify only on
    candidate ids (broadcast semi-join first, so the verify never
    re-shuffles the corpus).  ``max_bucket_size`` is the standard LSH
    skew cap (see minhash_lsh_pairs): a bucket of B members emits
    B(B-1)/2 pairs, so one degenerate bucket can dominate the job; at
    corpus scale cap it and let the within-family pairs surface through
    exact dedup / a representative pass instead.
    """
    from vunnel_spark.functions.vectors import cosine_hoisted, norm2
    from vunnel_spark.operators.similarity import add_lsh_buckets

    b = add_lsh_buckets(df, vec_col, n_tables, n_bits, dim).select(
        F.col(id_col).alias("id"),
        F.posexplode("buckets").alias("t", "bucket"),
    )
    grouped = (
        b.groupBy("t", "bucket")
        .agg(F.sort_array(F.collect_set("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if max_bucket_size:
        grouped = grouped.filter(F.size("ids") <= max_bucket_size)
    # ids are sorted, so successor pairing yields canonical id_a < id_b
    pair_structs = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), "
        "y -> struct(x AS id_a, y AS id_b))))"
    )
    cand = (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
        .persist()  # feeds two branches below; see minhash_lsh_pairs
    )
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .union(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # squared norms ride the cached per-doc frame: per-ROW facts are
    # computed once per candidate doc, not once per candidate PAIR
    # (functions/vectors.cosine_hoisted — bit-identical, 3x less
    # per-pair work)
    vecs = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .join(F.broadcast(cand_ids), "id", "left_semi")
        .withColumn("_n", norm2(F.col("vec")))
        .persist()
    )
    vecs.count()  # one action fills BOTH caches (cand is upstream)
    return (
        cand.join(
            vecs.select(
                F.col("id").alias("id_a"),
                F.col("vec").alias("_va"),
                F.col("_n").alias("_na"),
            ),
            "id_a",
        )
        .join(
            vecs.select(
                F.col("id").alias("id_b"),
                F.col("vec").alias("_vb"),
                F.col("_n").alias("_nb"),
            ),
            "id_b",
        )
        .withColumn(
            "cos_sim",
            F.round(
                cosine_hoisted(
                    F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
                ),
                6,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Hash-repartition on the id before explode/hash-heavy map stages.

    Document corpora often arrive as a handful of parquet files, so
    shingling/hashing would run on a couple of tasks while the rest of
    the cluster idles.  Repartitioning by id is unconditional and placed
    at the CHEAPEST point — one row per raw doc, before the ~200x shingle
    explode — and (a) unlocks full parallelism for the map stages while
    (b) pre-aligning the data with every downstream groupBy(id), which
    then satisfies its ClusteredDistribution without another exchange.
    (An earlier version probed df.rdd.getNumPartitions() to skip the
    shuffle on already-parallel input; the probe forces RDD conversion
    of the logical plan and bypasses AQE's coalescing knowledge, and the
    "saved" exchange just resurfaced at the first groupBy(id) — on the
    exploded frame, where it is far more expensive.)
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target, F.col(id_col))


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    nprobe: int = 1,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    method): cluster embeddings with a k-means coarse quantizer, then
    prune within-cluster pairs whose cosine exceeds ``threshold`` — the
    higher id of each such pair is marked dropped (keep-lowest, matching
    exact_dedup's survivor rule).

    ``nprobe`` > 1 assigns each vector to its n nearest cells, so a
    near-dup pair straddling a Voronoi boundary still shares at least
    one cell — recall stops depending on quantizer boundaries at the
    cost of ~nprobe× membership (duplicate pairs collapse in the
    keep-best window).

    Scale shape: cell assignment is a pure-Catalyst constant-expression
    scan (centroids as plan literals, same as IVF search); the quadratic
    work is bounded per cell, never corpus-wide; one shuffle on cell id.
    Returns (dropped_id, kept_id, cos_sim).

    SIZE nlist WITH THE CORPUS.  Per-cell pairing is O(cell_size^2), so
    a FIXED nlist makes the whole operator quadratic in corpus size —
    measured directly in the r9 scale-curve (SCALECURVE.md: d9 pins
    nlist=8 at every SF and its 10x-data time ratio is 55x; re-running
    sf1 with nlist=64 cut it 11.5x, back into the linear band).
    SemDeDup practice and this module's contract: pick ``nlist ~=
    n_vectors / target_cell_size`` (target ~1e3-1e4) so cells stay
    bounded; the gate query keeps nlist fixed only because its
    planted-pair oracle must not depend on quantizer granularity.
    """
    from vunnel_spark.functions.vectors import cosine_hoisted, norm2
    from vunnel_spark.operators.similarity import add_ivf_cells

    # Cell rows carry IDS ONLY — the embedding_dup_pairs r11 discipline.
    # (The pre-r14 shape collected struct(id, vec) members per cell and
    # emitted cos-scored pairs from a nested transform lambda: every
    # cosine ran as interpreted HOF evaluation — ~25 s at sf0.1 — and a
    # hot cell materialized O(cell^2) scored structs in ONE row, the
    # exact OOM class the d7 rework removed.  Pairing thin id arrays and
    # joining vectors back puts the cosine in a flat codegen projection
    # and streams the quadratic enumeration instead of materializing it.)
    cells = add_ivf_cells(df, centroids, vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("id"),
        F.explode("cells").alias("cell"),
    )
    grouped = (
        cells.groupBy("cell")
        .agg(F.sort_array(F.collect_set("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    # ids sorted ascending: successor pairing gives kept_id < dropped_id,
    # matching the old array_sort(collect_list(struct(id, vec))) order
    pair_structs = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), "
        "y -> struct(x AS kept_id, y AS dropped_id))))"
    )
    # nprobe>1 emits the same pair from every shared cell; distinct here
    # instead of letting the keep-best window collapse the duplicates
    # (identical rows either way — the window orders by (cos, kept_id))
    cand = (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select("p.kept_id", "p.dropped_id")
        .distinct()
        .persist()  # feeds two branches; see minhash_lsh_pairs
    )
    cand_ids = (
        cand.select(F.col("kept_id").alias("id"))
        .union(cand.select(F.col("dropped_id").alias("id")))
        .distinct()
    )
    # norms computed once per candidate doc, not per pair (see
    # embedding_dup_pairs)
    vecs = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .join(F.broadcast(cand_ids), "id", "left_semi")
        .withColumn("_n", norm2(F.col("vec")))
        .persist()
    )
    vecs.count()  # one action fills BOTH caches (cand is upstream)
    pairs = (
        cand.join(
            vecs.select(
                F.col("id").alias("kept_id"),
                F.col("vec").alias("_vk"),
                F.col("_n").alias("_nk"),
            ),
            "kept_id",
        )
        .join(
            vecs.select(
                F.col("id").alias("dropped_id"),
                F.col("vec").alias("_vd"),
                F.col("_n").alias("_nd"),
            ),
            "dropped_id",
        )
        .withColumn(
            "cos_sim",
            F.round(
                cosine_hoisted(
                    F.col("_vk"), F.col("_vd"), F.col("_nk"), F.col("_nd")
                ),
                6,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("dropped_id", "kept_id", "cos_sim")
    )
    # a doc may match several kept docs in its cell; report its best match
    w = Window.partitionBy("dropped_id").orderBy(
        F.col("cos_sim").desc(), F.col("kept_id")
    )
    return (
        pairs.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )


def _word_shingles(df: DataFrame, content_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) distinct word-k-gram rows, built with JVM expressions.

    transform over a sequence of start positions -> slice -> concat; no UDF.
    Precondition: one row per id (a document frame).  Shingles are deduped
    per document with array_distinct BEFORE the explode — cross-document
    (id, shingle) rows are then unique by construction, so no post-explode
    distinct (a full shuffle of the shingle frame) is needed.
    """
    # split ONCE into a named column: inlining the split by value
    # re-executes it at every reference — inside the transform lambda
    # that's once per shingle position, O(tokens) whole-text splits per
    # document (the r14 split-once lesson; _positioned_shingles already
    # had this form)
    base = _spread(df, id_col).select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.col(content_col)), r"\s+").alias("_w"),
    )
    n = F.size("_w")
    starts = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingles = F.when(n < k, F.array(F.concat_ws(" ", F.col("_w")))).otherwise(
        F.transform(
            starts, lambda i: F.concat_ws(" ", F.slice("_w", i + 1, k))
        )
    )
    return base.select(
        "id", F.explode(F.array_distinct(shingles)).alias("shingle")
    )


def _positioned_shingles(
    df: DataFrame, content_col: str, id_col: str, k: int
) -> DataFrame:
    """(id, pos, shingle) word-k-gram rows WITH start positions (0-based).

    Unlike _word_shingles this keeps every occurrence — positions are the
    payload here — and drops documents shorter than k tokens (a span
    below shingle width is below any sensible min_span threshold).
    """
    base = (
        _spread(df, id_col)
        .select(
            F.col(id_col).alias("id"),
            F.split(F.trim(F.col(content_col)), r"\s+").alias("_w"),
        )
        .filter(F.size("_w") >= k)
    )
    return base.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("_w") - k + 1),
                lambda i: F.concat_ws(" ", F.slice("_w", i, k)),
            )
        ).alias("pos", "shingle"),
    )


def shared_span_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_span_tokens: int = 15,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Longest EXACT shared token span per document pair — substring-level
    dedup (the public method of Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better", re-expressed relationally; the
    paper's suffix array is a single-machine construction, this is the
    shuffle-native equivalent for the >= min_span regime).

    A shared run of L >= k consecutive tokens appears as exactly L-k+1
    matching k-shingles at consecutive positions with a CONSTANT position
    offset between the two documents.  So: positioned shingles ->
    equi-join on shingle (id_a < id_b) -> group by (pair, pos_a - pos_b)
    -> gaps-and-islands (pos_a - row_number is constant within a
    consecutive run) -> longest island per pair + k - 1 tokens.

    Scale shape: candidate generation is the shingle equi-join — ONE
    shuffle keyed on the shingle, linear-ish under the standard
    ``max_shingle_freq`` cap against stopword-shingle floods (same knob
    as ngram_jaccard_pairs); the island windows partition by
    (id_a, id_b, diff), bounded by document length, never corpus-wide.
    Returns (id_a, id_b, span_tokens) for pairs sharing a span of at
    least ``min_span_tokens`` tokens.
    """
    sh = _positioned_shingles(df, content_col, id_col, k)
    if max_shingle_freq:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_f"))
        sh = sh.join(freq.filter(F.col("_f") <= max_shingle_freq), "shingle").drop("_f")
    a, b = sh.alias("a"), sh.alias("b")
    matches = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.pos").alias("pos_a"),
        (F.col("a.pos") - F.col("b.pos")).alias("_diff"),
    )
    w = Window.partitionBy("id_a", "id_b", "_diff").orderBy("pos_a")
    islands = matches.withColumn("_island", F.col("pos_a") - F.row_number().over(w))
    runs = islands.groupBy("id_a", "id_b", "_diff", "_island").agg(
        F.count(F.lit(1)).alias("_run")
    )
    return (
        runs.groupBy("id_a", "id_b")
        .agg((F.max("_run") + F.lit(k - 1)).alias("span_tokens"))
        .filter(F.col("span_tokens") >= min_span_tokens)
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


def containment_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.9,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Broder CONTAINMENT over word-k-gram shingle sets: c(A in B) =
    |A ∩ B| / |A| — the asymmetric companion to Jaccard that catches
    subset relationships Jaccard misses (a tweet quoted inside an
    article scores j ≈ |tweet|/|article| ≈ 0 but containment 1.0; the
    containment tail is a major residual-duplication source in web
    corpora after symmetric dedup).

    Same linear-ish plan as ngram_jaccard_pairs: distinct per-doc
    shingles, equi-join on shingle (docs sharing zero shingles never
    meet), ``max_shingle_freq`` caps stopword shingles before the
    self-join.  Emits one row per unordered pair (id_a < id_b) with
    BOTH directions; the filter keeps pairs where either direction
    reaches ``threshold``, decided on the ROUNDED value so any SQL
    oracle agrees.
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
        .withColumn("containment_a", F.round(F.col("n_common") / F.col("n_a"), 6))
        .withColumn("containment_b", F.round(F.col("n_common") / F.col("n_b"), 6))
        .filter(
            F.greatest(F.col("containment_a"), F.col("containment_b"))
            >= threshold
        )
        .select("id_a", "id_b", "n_common", "containment_a", "containment_b")
    )


def minhash_signatures(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """(id, sig: array<bigint>) MinHash signatures.

    The shingle string is hashed ONCE (xxhash64) to a 64-bit base value;
    permutation i is then xxhash64 over the fixed-width (base, seed) pair —
    1 variable-length string hash + ``num_hashes`` 16-byte hashes per
    shingle instead of ``num_hashes`` full string re-hashes (measured ~2x
    on the whole aggregate; the classic multiply-add universal-hash family
    would be cheaper still but wrapping long arithmetic throws under
    Spark 4's default ANSI mode).  A/B note: hashing the word-array slice
    directly (xxhash64(slice(words, i, k)), skipping concat_ws) measured
    ~4x SLOWER at sf0.1 (3.9s vs 1.0s warm) — xxhash64 over array<string>
    pays per-element dispatch, one contiguous string hash does not; keep
    the string form.

    Round-8 A/B (all interleaved in one session at sf0.1, cache cleared
    between runs so every run re-executes the full pipeline):
    - ARRAY-SIDE signatures (no explode/groupBy: sig computed per row as
      F.array(*[array_min(transform(hs, h -> xxhash64(h, s)))]) over the
      in-row shingle-hash array): 124s vs 1.5s — 80x SLOWER.  Spark does
      NOT common-subexpression-eliminate a subtree referenced as the
      argument of N higher-order functions in one projection, so the
      shingle array was recomputed once per permutation.  The
      explode+groupBy form is structural, not incidental.
    - XOR-ROTATE permutation family (h1 ^ rotl(h2, s): 2 string hashes +
      3 bitwise ops per permutation instead of one 16-byte xxhash64):
      aggregate stage 0.91s vs 0.78s — no win; the 16-byte fixed-width
      xxhash64 is already cheap relative to shingling, and the rotate
      family's weaker independence risks the exact-equality oracle.
    - Verify-phase sets built ARRAY-SIDE per doc (array_distinct of the
      in-row shingle array after _spread, both string and hashed-long
      element variants) instead of explode+groupBy collect_set: within
      +/-5% (3.08-3.13s vs 3.09s warm interleaved).  Expected: _spread
      pre-aligns the explode+groupBy form on id so its collect_set needs
      no extra exchange — the two forms have the same shuffle profile
      (one repartition of the raw candidate texts).  Kept the
      explode+groupBy form (shares _word_shingles with every other
      shingle operator).
    The remaining gap between warm pipeline time (~3.1s) and the bench
    slot (~3.9s) is fixed per-run overhead (10 jobs, 2 persist
    materializations, AQE replanning) that amortizes at real scale.  The per-seed minimum is ``num_hashes``
    parallel min-aggregates over the shingle frame: ONE shuffle keyed on
    id carrying 64 longs per id after map-side partial aggregation.  (The
    naive form — explode 64 seed rows per shingle then groupBy — shuffles
    64x the rows; same pathology the simhash bit-sum fix removed.)
    """
    sh = _word_shingles(df, content_col, id_col, k).withColumn(
        "_h", F.xxhash64(F.col("shingle"))
    )
    # whole signature as ONE parsed aggregate expression — num_hashes
    # separate Column builds (min/xxhash64/lit/alias each a py4j round
    # trip) plus the 48-column intermediate cost ~1.7 s of construction
    # per build vs ~0.2 s for the single text (r14 A/B, identical rows);
    # bare integer literals parse to the same INT type F.lit produced,
    # so the hashes are unchanged
    sig_expr = (
        "array("
        + ", ".join(f"min(xxhash64(_h, {s}))" for s in range(num_hashes))
        + ")"
    )
    return sh.groupBy("id").agg(F.expr(sig_expr).alias("sig"))


def _band_buckets(
    df: DataFrame,
    content_col: str,
    id_col: str,
    k: int,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """(id, band, bucket) banded-LSH bucket rows for a document frame.

    All ``bands`` bucket keys in ONE projection with literal band indices:
    xxhash64 directly over the band's signature longs.  (The first form
    exploded 16 band rows per doc and then built a per-row STRING from a
    runtime slice — cast + concat_ws dominated the stage; hashing fixed-
    width longs is ~3x cheaper and the explode now carries a precomputed
    16-long array instead of the 64-long signature.)
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, content_col, id_col, k, num_hashes)
    # one parse for the whole bucket array (see minhash_signatures)
    bucket_sqls = []
    for b in range(bands):
        elems = ", ".join(
            f"element_at(sig, {b * rows_per_band + i + 1})"
            for i in range(rows_per_band)
        )
        bucket_sqls.append(f"xxhash64({b}, {elems})")
    bucket_arr = F.expr("array(" + ", ".join(bucket_sqls) + ")")
    return sig.select("id", F.posexplode(bucket_arr).alias("band", "bucket"))


def write_lsh_index(
    df: DataFrame,
    path: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    mode: str = "overwrite",
) -> None:
    """Materialize the (id, band, bucket) LSH index for a corpus — the
    incremental-dedup serving layout.

    At 100 TB the corpus is signed ONCE; each ingest batch signs only its
    own documents and probes this table (minhash_lsh_pairs_incremental).
    The index is ~24 bytes x bands per document regardless of text size.
    Append new batches' buckets with ``mode="append"`` after probing so
    the next batch sees them.
    """
    _band_buckets(df, content_col, id_col, k, num_hashes, bands).write.mode(
        mode
    ).parquet(path)


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    index_path: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup CANDIDATES between a new batch and an indexed corpus.

    The corpus side is the persisted (id, band, bucket) table from
    write_lsh_index — its documents are never re-read, re-shingled, or
    re-hashed; only the new batch runs the signature pipeline.  One
    equi-join on (band, bucket) with the new side broadcast when small
    (left to AQE).  Returns distinct (new_id, corpus_id) pairs; callers
    verify against their corpus text store exactly like the batch
    operator's candidates-only verify phase, then append the new batch's
    buckets to the index.  ``max_bucket_size`` caps per-(band, bucket)
    corpus membership against degenerate boilerplate buckets.
    """
    spark = new_docs.sparkSession
    corpus = spark.read.parquet(index_path)
    if max_bucket_size:
        sizes = corpus.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("_n")
        )
        corpus = corpus.join(
            sizes.filter(F.col("_n") <= max_bucket_size), ["band", "bucket"]
        ).drop("_n")
    nb = _band_buckets(new_docs, content_col, id_col, k, num_hashes, bands)
    return (
        corpus.withColumnRenamed("id", "corpus_id")
        .join(nb.withColumnRenamed("id", "new_id"), ["band", "bucket"])
        .filter(F.col("new_id") != F.col("corpus_id"))
        .select("new_id", "corpus_id")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    verify_threshold: float | None = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash + banded LSH candidate pairs, optionally Jaccard-verified.

    Band bucket key = hash(band_index, signature slice); candidates are
    pairs sharing >=1 bucket.  Pair generation groups ids per (band,
    bucket) and emits in-bucket combinations with JVM array expressions —
    ONE pass over the signature pipeline (a self-join would recompute the
    whole minhash stage once per join side) and one shuffle of the thin
    (id, band, bucket) frame.  With 64 hashes / 16 bands (rows=4) the
    S-curve crosses ~0.5 Jaccard.

    ``max_bucket_size`` drops degenerate buckets (near-identical boilerplate
    floods at corpus scale): a bucket of B ids emits B(B-1)/2 candidate
    pairs, so one pathological bucket can dominate the output; capping
    mirrors the max_shingle_freq knob and standard LSH practice.
    """
    buckets = _band_buckets(df, content_col, id_col, k, num_hashes, bands)
    grouped = (
        buckets.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if max_bucket_size:
        grouped = grouped.filter(F.size("ids") <= max_bucket_size)
    # ids are sorted, so pairing each element with its successors yields
    # canonical (id_a < id_b) pairs with no post-hoc ordering fixup
    # (single parsed text — the Python-lambda HOF build was ~15 py4j
    # round trips per construction; identical tree)
    pair_structs = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), "
        "y -> struct(x AS id_a, y AS id_b))))"
    )
    cand = (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )
    if verify_threshold is None:
        return cand
    # Verify CANDIDATES ONLY: join the candidate pairs to per-doc shingle
    # sets and score Jaccard with array_intersect — cost is O(|candidates|),
    # never the full-corpus shingle self-join LSH exists to avoid.  The
    # DOCUMENT frame is semi-joined to candidate ids BEFORE re-shingling
    # (cand_ids is tiny -> broadcast semi-join, no corpus shuffle), so the
    # second shingling pass explodes only candidate docs — at 100 TB
    # candidates are a sliver of the corpus and this is the difference
    # between shingling the corpus twice and shingling candidates only.
    # ``cand`` feeds two branches (the id semi-join and the pair join);
    # persisting it keeps the signature+bucket pipeline — the expensive
    # stage — from being computed once per branch.  Candidate pairs are two
    # longs per row; at any scale this is the frame you cache.  Lazy
    # persists RACE when two branches of one final query each reach an
    # unfilled cache (observed: 2x wall time, nondeterministically), so a
    # cache must be materialized by an action before fan-out — but ONE
    # action suffices for both: ``sets`` is downstream of ``cand`` (via
    # cand_ids), so sets.count() fills the cand cache on the way (single
    # job, single subtree, no race) and the final join sees both caches
    # hot.  (r9: folded the separate cand.count() job into this one —
    # same work, one fewer job + one fewer pass, per the r8 verdict's
    # overhead-trim ask.)
    cand = cand.persist()
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .union(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    cand_docs = df.join(
        F.broadcast(cand_ids.withColumnRenamed("id", id_col)), id_col, "left_semi"
    )
    sh = _word_shingles(cand_docs, content_col, id_col, k)
    sets = sh.groupBy("id").agg(
        F.collect_set("shingle").alias("shset"), F.count(F.lit(1)).alias("n_sh")
    ).persist()
    sets.count()  # eager: fills BOTH caches (sets, and cand upstream of it)
    sa = sets.select(
        F.col("id").alias("id_a"), F.col("shset").alias("_sa"), F.col("n_sh").alias("n_a")
    )
    sb = sets.select(
        F.col("id").alias("id_b"), F.col("shset").alias("_sb"), F.col("n_sh").alias("n_b")
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("_common", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "_jacc",
            F.col("_common") / (F.col("n_a") + F.col("n_b") - F.col("_common")),
        )
        # filter on the UNROUNDED ratio (matches the oracle's order of
        # operations); rounding happens only in the final projection
        .filter(F.col("_jacc") >= verify_threshold)
        .select("id_a", "id_b", F.round("_jacc", 6).alias("jaccard"))
    )


def md5_prefix_hash(c):
    """60-bit word hash from the first 15 hex chars of md5 — engine-portable.

    md5 is bit-identical across Spark, DuckDB, and every other engine, so a
    simhash built on this family has an exact cross-engine expected output
    (unlike xxhash64, which only Spark implements).  15 hex chars = 60 bits,
    safely inside a signed 64-bit long.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def simhash_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_tables: int = 4,
    word_hash=None,
) -> DataFrame:
    """64-bit SimHash near-dup pairs via banded bucketing.

    SimHash built with JVM expressions: explode words -> word hash ->
    per-bit +/-1 sums -> sign bits reassembled.  Pair generation buckets on
    each of ``n_tables`` 16-bit slices (a pair within hamming distance 3 of
    a 64-bit key agrees exactly on at least one of 4 slices — pigeonhole),
    then verifies true hamming distance with bit_count(xor).

    ``word_hash`` maps a word Column to a BIGINT Column; default xxhash64
    (fastest, JVM-native).  Pass :func:`md5_prefix_hash` when the simhash
    must be reproducible outside Spark (its top 4 bits are constant-zero,
    leaving an effective 60-bit simhash — the slice bucketing and hamming
    verify are unaffected since those bits agree on every pair).
    """
    if word_hash is None:
        word_hash = F.xxhash64
    words = _spread(df, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(content_col)), r"\s+")).alias("w"),
    ).withColumn("h", word_hash(F.col("w")))
    # 64 conditional-sum aggregates over the words frame: ONE shuffle keyed
    # on id, no per-bit row explosion (the old 64x explode shuffled 64 rows
    # per word — a 64x blowup at 100 TB).  Partial aggregation makes the
    # map-side output 64 longs per id regardless of document length.
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{b}")
        for b in range(64)
    ]
    sums = words.groupBy("id").agg(*bit_sums)
    simhash_expr = None
    for b in range(64):
        bit = F.when(F.col(f"_b{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        simhash_expr = term if simhash_expr is None else simhash_expr.bitwiseOR(term)
    sim = sums.select("id", simhash_expr.alias("simhash"))
    slices = sim.select(
        "id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_tables - 1))).alias("t"),
    ).withColumn(
        # SQL shiftright accepts a column shift amount (the python F.shiftright doesn't)
        "slice",
        F.expr("shiftright(simhash, t * 16)").bitwiseAND(F.lit(0xFFFF)),
    )
    # in-bucket pair generation (see minhash_lsh_pairs): group collision
    # members per (table, slice) and emit successor combinations — the
    # simhash aggregation pipeline runs once, where a self-join would run
    # the 64-bit-sum stage per join side.  Members carry their simhash so
    # hamming scores without re-joining the corpus.
    grouped = (
        slices.groupBy("t", "slice")
        .agg(
            F.array_sort(
                F.collect_set(F.struct(F.col("id"), F.col("simhash")))
            ).alias("members")
        )
        .filter(F.size("members") >= 2)
    )
    pair_structs = F.expr(
        "flatten(transform(members, (x, i) -> "
        "transform(slice(members, i + 2, size(members)), "
        "y -> struct(x.id AS id_a, y.id AS id_b, "
        "bit_count(x.simhash ^ y.simhash) AS hamming))))"
    )
    return (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
