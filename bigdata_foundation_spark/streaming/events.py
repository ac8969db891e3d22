"""Structured Streaming surface.

The reference is purely batch (SURVEY.md §2.4 — no watermarks, no
windows, no stateful streaming anywhere in it), so this module is
north-star surface: the same event-table aggregations the batch
registry exposes, expressed as incremental streaming queries with
late-data handling. Semantics contract: a stream run with
``availableNow`` over the same files must equal the batch query —
that equivalence is the test oracle (tests/test_streaming.py).

Scale notes: watermarks bound state (an unbounded-state streaming agg
OOMs a real cluster); session windows use the built-in
``session_window`` (state-store backed, merge-on-gap); streaming dedup
uses ``dropDuplicatesWithinWatermark`` so the dedup state also ages
out instead of growing forever.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # ns-as-long (see queries._t note)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over the events parquet (the standard way to
    replay a table as a stream; in production this is the Kafka/queue
    reader with the same downstream plan).

    ``path`` may be a directory or a single parquet file; the file
    source requires a directory, so a lone file is exposed through a
    symlink in a scratch dir."""
    import os

    if os.path.isfile(path):
        d = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(path, os.path.join(d, os.path.basename(path)))
        path = d
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def hourly_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming twin of
    the batch ``events_hourly`` query. Late rows beyond the watermark
    are dropped and window state is evicted (bounded state)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts_stream(
    events: DataFrame, length: str = "1 hour", slide: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Sliding (hopping) windows: each event lands in length/slide
    overlapping windows. Same bounded-state story as the tumbling
    variant."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", length, slide).alias("w"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per user: activity separated by more than
    ``gap`` starts a new session. State-store merge-on-gap via the
    built-in session_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-event stream: drop duplicate event_ids seen
    within the watermark horizon (state ages out, unlike a plain
    dropDuplicates whose state grows unboundedly)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


_RUN_COUNTER = [0]


def run_to_memory(df: DataFrame, name: str, spark: SparkSession) -> DataFrame:
    """Execute a streaming plan over all currently-available input
    (Trigger.AvailableNow) into an in-memory table; returns the final
    result as a batch DataFrame. Used by tests and the bench."""
    _RUN_COUNTER[0] += 1
    name = f"{name}_{_RUN_COUNTER[0]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete" if df.isStreaming and _has_aggregate(df) else "append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def _has_aggregate(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().logical().toString()
    return "Aggregate" in plan
