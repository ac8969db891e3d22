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

    from bigdata_foundation_spark.streaming.events import normalize_event_ts

    got = run_to_memory(running_zscore_stream(events_stream), "t_zscore", spark)
    want = running_zscore_batch(
        normalize_event_ts(spark.read.parquet(f"{SF_TINY}/events.parquet"))
    )
    g = {(r["user_id"], r["event_id"]): (r["z"], r["n_prior"]) for r in got.collect()}
    w = {(r["user_id"], r["event_id"]): (r["z"], r["n_prior"]) for r in want.collect()}
    assert len(g) > 100 and g.keys() == w.keys()
    for k, (z, n) in g.items():
        assert w[k][1] == n
        assert abs(w[k][0] - z) < 1e-9, (k, z, w[k])


def _write_batch(spark, path, rows, schema, mtime):
    import os
    df = spark.createDataFrame(rows, schema).coalesce(1)
    df.write.mode("append").parquet(path)
    # file-source processes in modification-time order; pin it
    for f in os.listdir(path):
        full = os.path.join(path, f)
        if not f.startswith(("_", ".")):
            cur = os.path.getmtime(full)
            if cur > mtime:
                os.utime(full, (mtime, mtime))


def test_foreach_batch_upsert(spark, tmp_path):
    from bigdata_foundation_spark.streaming.sinks import foreach_batch_upsert

    src, target, ckpt = str(tmp_path / "src"), str(tmp_path / "tgt"), str(tmp_path / "ckpt")
    schema = "k long, v long"
    _write_batch(spark, src, [(1, 1), (2, 2)], schema, 1_000_000)
    _write_batch(spark, src, [(1, 10), (3, 3)], schema, 2_000_000)

    def stream():
        return (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )

    foreach_batch_upsert(stream(), target, ["k"], checkpoint_dir=ckpt)
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: 10, 2: 2, 3: 3}

    # Incremental restart from the same checkpoint: only the new file
    # is processed, existing keys update in place.
    _write_batch(spark, src, [(2, 20)], schema, 3_000_000)
    foreach_batch_upsert(stream(), target, ["k"], checkpoint_dir=ckpt)
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: 10, 2: 20, 3: 3}


def test_watermark_drops_late_rows(spark, tmp_path):
    """A row older than the watermark must be excluded from its
    (already-finalized) window — the late-data contract that makes
    streaming aggregation state bounded at production scale."""
    import datetime as dt

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    schema = "event_id long, user_id long, ts timestamp, value double"

    def t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    on_time = [(1, 1, t(10), 1.0), (2, 1, t(10, 30), 1.0), (3, 1, t(11), 1.0), (4, 1, t(12), 1.0)]
    _write_batch(spark, src, on_time, schema, 1_000_000)

    def run(name):
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("hour"), "n")
        )
        rows = []
        # foreachBatch (unlike the memory sink) supports restarting
        # from a checkpoint, which run2 needs
        q = (
            agg.writeStream.foreachBatch(lambda bdf, _id: rows.extend(bdf.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r.hour: r.n for r in rows}

    first = run("wm_run1")  # watermark after batch: 12:00 - 1h = 11:00
    assert first.get(t(10)) == 2  # hour-10 window finalized with both rows

    # late row at 09:00 (behind the 11:00 watermark -> dropped) plus a
    # fresh row at 14:00 that advances the watermark past hour 12
    _write_batch(spark, src, [(5, 1, t(9), 1.0), (6, 1, t(14), 1.0)], schema, 2_000_000)
    second = run("wm_run2")
    emitted = {**first, **second}
    assert t(9) not in emitted  # late row silently dropped
    assert emitted.get(t(11)) == 1 and emitted.get(t(12)) == 1


def test_interval_join_stream_equals_batch(spark, events_stream):
    from bigdata_foundation_spark.streaming import click_purchase_interval_join

    got = run_to_memory(
        click_purchase_interval_join(events_stream), "t_ij", spark
    )
    from bigdata_foundation_spark.streaming.events import normalize_event_ts

    batch = normalize_event_ts(spark.read.parquet(f"{SF_TINY}/events.parquet"))
    want = click_purchase_interval_join(batch)
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w and len(g) > 0


def test_streaming_corpus_dedup(spark, tmp_path):
    """Greedy streaming corpus ingest: (a) the availableNow streaming
    wrapper produces exactly the same accepted corpus as driving
    process_corpus_batch over the same batches directly (stream ==
    batch), (b) semantics — exact dup dropped within its batch,
    cross-batch near-dup rejected via the persisted index, unrelated
    docs accepted, (c) a checkpointed restart with no new files leaves
    the corpus and index untouched."""
    from bigdata_foundation_spark.streaming.corpus import (
        process_corpus_batch,
        streaming_corpus_dedup,
    )

    schema = "doc_id long, text string"
    base = "the quick brown fox jumps over the lazy dog in the morning light"
    batch1 = [
        (1, base),
        (2, base),  # exact duplicate of 1 -> dropped within batch 1
        (3, "completely different text about database systems and query engines"),
    ]
    batch2 = [
        (4, base + "s"),  # near-duplicate of 1 -> rejected against the index
        (5, "unrelated musings on distributed consensus and replicated logs"),
    ]

    # direct batch drive
    d_idx, d_corp = str(tmp_path / "d_idx"), str(tmp_path / "d_corp")
    for rows in (batch1, batch2):
        process_corpus_batch(
            spark, spark.createDataFrame(rows, schema), d_idx, d_corp
        )
    direct = sorted(r.doc_id for r in spark.read.parquet(d_corp).collect())
    assert direct == [1, 3, 5]

    # streaming drive over a file source, one file per micro-batch in
    # pinned mtime order
    src = str(tmp_path / "src")
    s_idx, s_corp, ckpt = (
        str(tmp_path / "s_idx"),
        str(tmp_path / "s_corp"),
        str(tmp_path / "ckpt"),
    )
    _write_batch(spark, src, batch1, schema, 1_000_000)
    _write_batch(spark, src, batch2, schema, 2_000_000)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    streaming_corpus_dedup(spark, stream, s_idx, s_corp, ckpt)
    streamed = sorted(r.doc_id for r in spark.read.parquet(s_corp).collect())
    assert streamed == direct
    # accepted rows keep their original columns
    row = spark.read.parquet(s_corp).filter(F.col("doc_id") == 3).first()
    assert row.text.startswith("completely different")

    # restart from the same checkpoint with no new input: no-op
    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    streaming_corpus_dedup(spark, stream2, s_idx, s_corp, ckpt)
    assert sorted(r.doc_id for r in spark.read.parquet(s_corp).collect()) == direct


def test_streaming_corpus_compaction_mid_stream(spark, tmp_path):
    """r5 verdict task 5: the compaction cadence must fire MID-STREAM
    and leave everything row-identical — same accepted corpus as the
    uncompacted run, same index query behavior afterwards (a later
    near-dup batch still gets rejected), and the index file count must
    actually shrink versus per-batch append accretion."""
    from bigdata_foundation_spark.streaming.corpus import (
        _index_file_count,
        streaming_corpus_dedup,
    )

    schema = "doc_id long, text string"
    base = "the quick brown fox jumps over the lazy dog in the morning light"
    batches = [
        [(1, base), (3, "completely different text about database systems and query engines")],
        [(5, "unrelated musings on distributed consensus and replicated logs")],
        [(7, "yet another corpus document mentioning stream processing watermarks")],
        [(9, base + "s")],  # near-dup of 1: must be rejected AFTER compactions
        [(11, "final fresh document on columnar storage layouts and encodings")],
    ]
    src = str(tmp_path / "src")
    for i, rows in enumerate(batches):
        _write_batch(spark, src, rows, schema, (i + 1) * 1_000_000)

    def drive(tag, **kw):
        idx, corp, ck = (
            str(tmp_path / f"{tag}_idx"),
            str(tmp_path / f"{tag}_corp"),
            str(tmp_path / f"{tag}_ckpt"),
        )
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        streaming_corpus_dedup(spark, stream, idx, corp, ck, **kw)
        return idx, sorted(r.doc_id for r in spark.read.parquet(corp).collect())

    plain_idx, plain = drive("plain")
    comp_idx, comp = drive("comp", compact_every=2)
    assert plain == comp == [1, 3, 5, 7, 11]  # 9 rejected post-compaction
    assert _index_file_count(comp_idx) < _index_file_count(plain_idx)


def test_streaming_scd2_equals_batch(spark, tmp_path):
    """Incremental SCD2 (r7): a 3-batch changelog exercising every
    stitch path — extend (same attr spans a batch boundary), close
    (attr changes at a boundary), new-key mid-stream, untouched-key
    passthrough — lands ROW-IDENTICAL to the batch operator run over
    the full changelog."""
    from pyspark.sql import functions as F

    from bigdata_foundation_spark.operators.relational import scd2_history
    from bigdata_foundation_spark.streaming.sinks import foreach_batch_scd2

    schema = "event_id long, ts string, user_id long, event_type string"
    batches = [
        [
            (1, "2024-01-01 10:00:00", 100, "a"),
            (2, "2024-01-01 11:00:00", 100, "a"),
            (3, "2024-01-01 09:00:00", 200, "x"),
        ],
        [
            (4, "2024-01-02 08:00:00", 100, "a"),  # extends 100's open 'a'
            (5, "2024-01-02 09:00:00", 100, "b"),  # then closes it
            (6, "2024-01-02 10:00:00", 300, "q"),  # new key mid-stream
        ],  # 200 untouched this batch
        [
            (7, "2024-01-03 07:00:00", 100, "b"),  # extends 'b'
            (8, "2024-01-03 08:00:00", 200, "y"),  # closes 200's 'x'
        ],
    ]
    src = str(tmp_path / "src")
    for i, rows in enumerate(batches):
        _write_batch(spark, src, rows, schema, (i + 1) * 1_000_000)

    target, ckpt = str(tmp_path / "dim"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    foreach_batch_scd2(
        stream, target, "user_id", "event_type", "ts", "event_id",
        checkpoint_dir=ckpt,
    )

    full = spark.createDataFrame(
        [r for b in batches for r in b], schema
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = scd2_history(full, "user_id", "event_type", "ts", "event_id")

    as_rows = lambda df: sorted(
        (r["user_id"], r["version"], r["event_type"], str(r["valid_from"]),
         str(r["valid_to"]), r["n_events"], r["is_current"])
        for r in df.collect()
    )
    got = as_rows(spark.read.parquet(target))
    assert got == as_rows(want)
    # spot-pin the interesting rows
    assert (100, 1, "a", "2024-01-01 10:00:00", "2024-01-02 09:00:00", 3, False) in got
    assert (100, 2, "b", "2024-01-02 09:00:00", "2261-12-31 00:00:00", 2, True) in got
    assert (200, 1, "x", "2024-01-01 09:00:00", "2024-01-03 08:00:00", 1, False) in got

    # Lineage discipline (r9, advisor): a DIFFERENT checkpoint lineage
    # writing to the marked table must FAIL LOUDLY — a fresh checkpoint
    # restarts batch ids at 0, so the old plain `<=` guard would have
    # silently discarded genuinely new batches. The dimension stays
    # untouched by the failed attempt.
    import pytest as _pt

    with _pt.raises(Exception, match="lineage"):
        foreach_batch_scd2(stream, target, "user_id", "event_type", "ts", "event_id")
    assert as_rows(spark.read.parquet(target)) == got

    # Same-lineage continuation: resuming from the ORIGINAL checkpoint
    # with new source data applies exactly the new batch (the intended
    # incremental daily-run shape), replaying nothing.
    late = [(9, "2024-01-04 06:00:00", 300, "r")]  # closes 300's 'q'
    _write_batch(spark, src, late, schema, 9_000_000)
    foreach_batch_scd2(
        stream, target, "user_id", "event_type", "ts", "event_id",
        checkpoint_dir=ckpt,
    )
    full2 = spark.createDataFrame(
        [r for b in batches for r in b] + late, schema
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want2 = scd2_history(full2, "user_id", "event_type", "ts", "event_id")
    assert as_rows(spark.read.parquet(target)) == as_rows(want2)
