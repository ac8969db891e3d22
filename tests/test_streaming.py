"""Streaming ≡ batch equivalence: an availableNow replay of the events
files through the streaming plans must produce exactly the batch
answers (the strongest oracle a streaming pipeline can have)."""

import pytest
from pyspark.sql import functions as F

from bigdata_foundation_spark.streaming import (
    hourly_counts_stream,
    read_events_stream,
    run_to_memory,
    sessionize_stream,
    streaming_dedup,
)

from .conftest import SF_TINY


@pytest.fixture(scope="module")
def events_stream(spark):
    return read_events_stream(spark, f"{SF_TINY}/events.parquet")


def test_hourly_equals_batch(spark, events_stream):
    from bigdata_foundation_spark.queries import events_hourly

    got = run_to_memory(hourly_counts_stream(events_stream), "t_hourly", spark)
    want = events_hourly(spark, SF_TINY)
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0


def test_sessionize(spark, events_stream):
    res = run_to_memory(sessionize_stream(events_stream), "t_sessions", spark)
    rows = res.collect()
    assert len(rows) > 0
    # sessions are disjoint per user and start <= end
    assert all(r["session_start"] <= r["session_end"] for r in rows)
    per_user = res.groupBy("user_id").agg(F.sum("n_events").alias("n")).collect()
    batch_counts = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(f"{SF_TINY}/events.parquet").groupBy("user_id").count().withColumnRenamed("count", "n").collect()
    }
    for r in per_user:
        assert r["n"] == batch_counts[r["user_id"]]


def test_streaming_dedup(spark, events_stream):
    res = run_to_memory(streaming_dedup(events_stream), "t_dedup", spark)
    n = res.count()
    batch_n = spark.read.parquet(f"{SF_TINY}/events.parquet").select("event_id").distinct().count()
    assert n == batch_n


def test_running_zscore_stream_equals_batch(spark, events_stream):
    """The applyInPandasWithState operator must reproduce the batch
    window-function computation exactly (modulo float accumulation
    order) — the stream-equals-batch oracle for custom state."""
    from bigdata_foundation_spark.streaming import running_zscore_batch, running_zscore_stream

    got = run_to_memory(running_zscore_stream(events_stream), "t_zscore", spark)
    want = running_zscore_batch(spark.read.parquet(f"{SF_TINY}/events.parquet")
                                .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))
    g = {(r["user_id"], r["event_id"]): (r["z"], r["n_prior"]) for r in got.collect()}
    w = {(r["user_id"], r["event_id"]): (r["z"], r["n_prior"]) for r in want.collect()}
    assert len(g) > 100 and g.keys() == w.keys()
    for k, (z, n) in g.items():
        assert w[k][1] == n
        assert abs(w[k][0] - z) < 1e-9, (k, z, w[k])
