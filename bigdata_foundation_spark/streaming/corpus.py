"""Streaming corpus ingest with cross-batch near-duplicate rejection.

The production shape for a training-data pipeline at 100 TB: documents
arrive as a stream (landing files, a queue), and every micro-batch must
be deduplicated BOTH within itself and against everything already
accepted into the corpus — without ever re-processing the stored
corpus. This module composes the batch dedup family into that loop:

    batch → exact dedup → within-batch MinHash-LSH clustering
          → probe the persisted MinHash index (cross-batch near-dups)
          → append survivors to the corpus AND fold them into the index

The stored corpus is touched only through the incremental index
(``operators.dedup.minhash_index_query`` / ``minhash_index_append``) —
bucket probes and O(#buckets) size merges, never a re-shingle. The
semantics are GREEDY FIRST-SEEN-WINS in batch arrival order: a
document is accepted iff it survives its own batch's clustering (min
id per duplicate cluster) and has no near-duplicate already in the
corpus. This is the standard streaming-dedup contract — unlike global
clustering over the full union, a document whose only near-duplicate
was itself rejected earlier IS accepted (its duplicate never joined
the corpus).

Pinned end-to-end by the ``streaming_corpus_dedup`` gate query: an
independent pure-Python replay of the greedy loop
(tools/gen_pipeline_goldens.py) generates the expected accepted set
over the sf0.01 documents processed as two batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_foundation_spark.operators.dedup import (
    duplicate_clusters,
    exact_dedup,
    minhash_index_append,
    minhash_index_build,
    minhash_index_compact,
    minhash_index_query,
    minhash_lsh_pairs,
)

_INDEX_TABLES = ("shingles", "signatures", "bands", "bucket_sizes")


def _index_file_count(index_path: str) -> int:
    """Data-file count across the index's append-only tables — the
    fragmentation signal the compaction cadence watches. Local-fs
    walk, same portability note as the ``meta`` existence probe."""
    n = 0
    for sub in _INDEX_TABLES:
        d = os.path.join(index_path, sub)
        if not os.path.isdir(d):
            continue
        for _dp, _dn, fns in os.walk(d):
            n += sum(1 for f in fns if not f.startswith(("_", ".")))
    return n


def dedup_batch_within(
    batch_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Within-batch dedup: exact (keep lowest id per normalized text)
    then near-dup clustering (MinHash-LSH pairs → connected components
    → keep the minimum id of each cluster). Returns the surviving rows
    with the batch's original columns."""
    b = exact_dedup(batch_df, text_col, id_col)
    pairs = minhash_lsh_pairs(
        b,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        threshold=threshold,
        max_bucket=max_bucket,
    )
    losers = (
        duplicate_clusters(pairs)
        .filter(F.col("node") != F.col("cluster_id"))
        .select(F.col("node").alias(id_col))
    )
    return b.join(losers, id_col, "left_anti")


def process_corpus_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    index_path: str,
    corpus_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket: int = 1000,
) -> None:
    """One greedy ingest step: within-batch dedup, cross-batch
    rejection via the persisted index, then append survivors to the
    corpus parquet and fold them into the index.

    The first batch (no index at ``index_path`` yet) bootstraps the
    index from its own survivors via ``minhash_index_build``; every
    later batch probes stored buckets only (``minhash_index_query``)
    and appends via the O(#buckets) ``minhash_index_append`` merge.
    Batch ids must be globally unique across the stream (the index
    append contract). Idempotence across checkpoint replays comes from
    the streaming wrapper's availableNow/checkpoint discipline —
    within one run each batch is applied exactly once. (Index
    existence is probed via the local filesystem — on an object store,
    swap the ``os.path`` check for a FileSystem listing; everything
    else is storage-agnostic Spark IO.)"""
    survivors = dedup_batch_within(
        batch_df,
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        max_bucket=max_bucket,
    )
    if os.path.exists(index_path + "/meta"):
        cross = minhash_index_query(
            spark,
            index_path,
            survivors,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
            max_bucket=max_bucket,
        )
        dupes = cross.select(F.col("query_id").alias(id_col)).distinct()
        accepted = survivors.join(dupes, id_col, "left_anti")
        # localCheckpoint: the accepted rows feed BOTH the corpus
        # append and the index append; materializing once also cuts
        # the plan's second pass over the batch pipeline.
        accepted = accepted.localCheckpoint()
        minhash_index_append(spark, index_path, accepted, text_col=text_col)
    else:
        accepted = survivors.localCheckpoint()
        minhash_index_build(
            accepted,
            index_path,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
        )
    accepted.write.mode("append").parquet(corpus_path)


def streaming_corpus_dedup(
    spark: SparkSession,
    docs_stream: DataFrame,
    index_path: str,
    corpus_path: str,
    checkpoint_dir: str,
    compact_every: int | None = None,
    compact_max_files: int | None = None,
    compact_target_file_mb: int = 512,
    **kwargs,
):
    """Run a streaming documents source through the greedy dedup loop
    to completion (Trigger.AvailableNow) — each micro-batch passes
    through :func:`process_corpus_batch` inside ``foreachBatch``.
    Returns after the stream drains; the accepted corpus is the
    parquet dataset at ``corpus_path``.

    **Compaction cadence** (the steady-state lifecycle): every index
    append adds one file set per table per batch, so a long-lived
    ingest fragments into thousands of small files — the 100 TB
    listing-storm failure mode. ``compact_every=N`` runs
    ``minhash_index_compact`` after every N applied batches;
    ``compact_max_files=M`` instead (or additionally) triggers when
    the index's data-file count exceeds M. Compaction is
    query-row-identical (the tables are unordered relations; pinned by
    tests), so it can fire mid-stream between any two batches. Left
    ``None``/``None`` the behavior is the r5 no-compaction one.

    At-least-once delivery × the checkpointed availableNow trigger
    gives effectively-once corpus growth for a well-formed source
    (batch replay after a crash re-runs the SAME batch contents; the
    index append would double postings on a replayed batch, so a
    production deployment should stage per-batch appends under the
    batch id — documented limitation, same trade as every
    non-transactional foreachBatch sink)."""
    applied = {"n": 0}

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        process_corpus_batch(
            spark, batch_df, index_path, corpus_path, **kwargs
        )
        applied["n"] += 1
        if not os.path.exists(index_path + "/meta"):
            return
        due = compact_every is not None and applied["n"] % compact_every == 0
        if not due and compact_max_files is not None:
            due = _index_file_count(index_path) > compact_max_files
        if due:
            minhash_index_compact(
                spark, index_path, target_file_mb=compact_target_file_mb
            )

    q = (
        docs_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
