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

def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` to a microsecond timestamp regardless of how
    the parquet was generated: TIMESTAMP(MICROS) reads as a timestamp
    directly; TIMESTAMP(NANOS) (with ``nanosAsLong``) reads as a long
    of epoch-nanos and is converted. Type-dispatch keeps the pipeline
    working across either writer."""
    if isinstance(df.schema["ts"].dataType, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
        # TIMESTAMP_NTZ → instant type so batch and stream paths agree
        # on one ts type (watermarks also require it); the session runs
        # in UTC so the cast is wall-clock preserving.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


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
    # The stream source needs an explicit schema; take it from the
    # batch reader's footer inspection so it tracks the writer.
    schema = spark.read.parquet(path).schema
    raw = spark.readStream.schema(schema).parquet(path)
    return normalize_event_ts(raw)


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


_ZSCORE_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("n_prior", T.LongType()),
    ]
)

# Running-moment state per user: (count, sum, sum of squares).
_ZSCORE_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("s2", T.DoubleType()),
    ]
)

MIN_PRIOR = 5


def running_zscore_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running z-score of each event's value against that user's PRIOR
    history — an order-dependent computation no built-in streaming agg
    expresses (each row needs the state as of just before it).

    State per user is three numbers (count, sum, sum-of-squares), so
    state size is O(users), not O(events) — the shape that survives an
    unbounded stream. Rows inside a micro-batch are processed in
    (ts, event_id) order; emits rows once the user has >= MIN_PRIOR
    prior events. Batch twin / oracle: ``running_zscore_batch``
    (window functions over the same ordering)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def score(key, pdfs, state: "GroupState"):
        import math

        import pandas as pd

        n, s, s2 = state.get if state.exists else (0, 0.0, 0.0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ev, v in zip(pdf["event_id"], pdf["value"]):
                v = float(v)
                if n >= MIN_PRIOR:
                    mean = s / n
                    var = max((s2 - n * mean * mean) / (n - 1), 0.0)
                    sd = math.sqrt(var)
                    if sd > 0:
                        out.append((key[0], int(ev), v, (v - mean) / sd, n))
                n, s, s2 = n + 1, s + v, s2 + v * v
        state.update((n, s, s2))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "event_id", "value", "z", "n_prior"])

    return events.groupBy("user_id").applyInPandasWithState(
        score,
        outputStructType=_ZSCORE_OUT,
        stateStructType=_ZSCORE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_zscore_batch(events: DataFrame) -> DataFrame:
    """Batch twin of ``running_zscore_stream``: the same per-user
    prior-history z-score via window frames (rows between unbounded
    preceding and 1 preceding), for the stream-equals-batch oracle."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior_n = F.count("value").over(w)
    prior_mean = F.avg("value").over(w)
    prior_sd = F.stddev_samp("value").over(w)
    return (
        events.select(
            "user_id",
            "event_id",
            "value",
            prior_n.alias("n_prior"),
            ((F.col("value") - prior_mean) / prior_sd).alias("z"),
        )
        .filter((F.col("n_prior") >= MIN_PRIOR) & F.col("z").isNotNull())
        .select("user_id", "event_id", "value", "z", "n_prior")
    )


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
