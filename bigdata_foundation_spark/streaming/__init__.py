"""Structured Streaming operators over the events stream table."""

from bigdata_foundation_spark.streaming.events import (
    hourly_counts_stream,
    read_events_stream,
    run_to_memory,
    running_zscore_batch,
    running_zscore_stream,
    sessionize_stream,
    streaming_dedup,
)
from bigdata_foundation_spark.streaming.joins import click_purchase_interval_join
from bigdata_foundation_spark.streaming.corpus import (
    dedup_batch_within,
    process_corpus_batch,
    streaming_corpus_dedup,
)
from bigdata_foundation_spark.streaming.source import (
    SnapshotDataSource,
    register_snapshot_source,
)

__all__ = [
    "click_purchase_interval_join",
    "dedup_batch_within",
    "process_corpus_batch",
    "streaming_corpus_dedup",
    "read_events_stream",
    "hourly_counts_stream",
    "sessionize_stream",
    "streaming_dedup",
    "running_zscore_stream",
    "running_zscore_batch",
    "run_to_memory",
    "SnapshotDataSource",
    "register_snapshot_source",
]
