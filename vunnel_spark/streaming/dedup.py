"""Streaming ingestion near-dup filtering against the persisted LSH index.

The batch dedup family answers "which pairs in this corpus are near-dups";
an INGESTION pipeline asks a different question per micro-batch: "which of
these new documents duplicate anything already accepted?"  That is the
incremental index probe (operators/dedup.py minhash_lsh_pairs_incremental)
run under ``foreachBatch``: each micro-batch signs only its own documents,
probes the bucket index built by ``write_lsh_index``, drops collisions,
and appends the survivors' buckets so the NEXT batch sees them — the
index grows with accepted documents, never with rejected ones.

Semantics and caveats (stated, not hidden):
- Candidates-only (the recall path): a document is dropped on ANY bucket
  collision with an accepted document.  Exact-Jaccard verification needs
  the accepted-corpus text store and belongs in a compaction pass — at
  ingestion time false-positive drops are rare (16 bands of 4 rows cross
  ~0.5 Jaccard) and recall is what protects the training corpus.
- Within-batch near-dups are also collapsed, keep-lowest-id, using the
  same banded candidates.
- Delivery is at-least-once: a replayed micro-batch re-probes an index
  that already carries its own ids.  Self-collisions are excluded by id,
  so replayed documents are re-accepted and re-appended — read the
  survivors table with ``dropDuplicates(id_col)`` (or sink through
  EnvelopeWriter first-wins) if exact-once matters downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def foreach_batch_near_dup_filter(
    stream: DataFrame,
    index_path: str,
    survivors_path: str,
    checkpoint: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = None,
):
    """Start the ingestion-dedup stream; returns the StreamingQuery.

    Per micro-batch: in-batch collapse (keep lowest id) -> index probe
    (skip when the index does not exist yet: first batch seeds it) ->
    append surviving rows to ``survivors_path`` and their buckets to
    ``index_path``.
    """
    import os

    from vunnel_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
        write_lsh_index,
    )

    lsh_kw = dict(k=k, num_hashes=num_hashes, bands=bands)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.persist()
        try:
            if batch.isEmpty():
                return
            # within-batch collapse: drop the higher id of every candidate
            in_batch = minhash_lsh_pairs(
                batch,
                content_col,
                id_col,
                verify_threshold=None,
                max_bucket_size=max_bucket_size,
                **lsh_kw,
            )
            drop_ids = in_batch.select(F.col("id_b").alias(id_col)).distinct()
            kept = batch.join(drop_ids, id_col, "left_anti")
            # cross-batch probe against everything accepted so far
            if os.path.isdir(index_path):
                hits = minhash_lsh_pairs_incremental(
                    kept,
                    index_path,
                    content_col,
                    id_col,
                    max_bucket_size=max_bucket_size,
                    **lsh_kw,
                ).select(F.col("new_id").alias(id_col)).distinct()
                kept = kept.join(hits, id_col, "left_anti")
            kept = kept.persist()
            kept.write.mode("append").parquet(survivors_path)
            write_lsh_index(
                kept, index_path, content_col, id_col, mode="append", **lsh_kw
            )
            kept.unpersist()
        finally:
            batch.unpersist()

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .start()
    )
