"""Round-15 operator tests: the r14 advice fixes (group blobs through
the log-store seam, streaming-source startingVersion-after-vacuum,
change-feed multiplicity contract, exact-file WARC input, MemArchiveFS
glob scope), plus the round's new surface (streaming-source rate
limiting, change-feed streaming mode, v2 group compaction).
"""

import json
import os

import pytest
from pyspark.sql import functions as F


# ------------------- MemArchiveFS glob scope --------------------------


def test_mem_fs_glob_does_not_cross_separators():
    """'*' must match a single path segment on EVERY backend (r14
    advice: fnmatch let it cross '/', so Mem saw nested files POSIX
    glob would not)."""
    from bigdata_foundation_spark.fs import MemArchiveFS

    fs = MemArchiveFS(
        {
            "d/a.warc.gz": b"1",
            "d/sub/b.warc.gz": b"2",
            "d/sub/deep/c.warc.gz": b"3",
        }
    )
    assert fs.glob("d/*.warc.gz") == ["d/a.warc.gz"]
    assert fs.glob("d/sub/*.warc.gz") == ["d/sub/b.warc.gz"]
    assert fs.glob("d/*/*.warc.gz") == ["d/sub/b.warc.gz"]


def test_check_archive_fs_all_backends(tmp_path):
    """The executable contract (now including glob segment scope)
    passes on every shipped backend."""
    from bigdata_foundation_spark.fs import (
        MemArchiveFS,
        PosixArchiveFS,
        PrefixArchiveFS,
        check_archive_fs,
    )

    check_archive_fs(PosixArchiveFS(), str(tmp_path / "posix"))
    check_archive_fs(
        PrefixArchiveFS("probe", str(tmp_path / "pfx")), "probe://scratch"
    )
    check_archive_fs(MemArchiveFS(), "mem/scratch")


# ------------------- exact-file WARC input ----------------------------


def _write_member_gz(path, payloads):
    import gzip

    with open(path, "wb") as fh:
        for p in payloads:
            fh.write(gzip.compress(p))


def test_read_warc_gz_explicit_file_bypasses_manifest(spark, tmp_path):
    """An explicitly named existing file is read as given even when
    the directory's commit manifest does not list it (r14 advice: the
    filter made a real file raise FileNotFoundError)."""
    from bigdata_foundation_spark import io as bio

    d = tmp_path / "arch"
    d.mkdir()
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.com/\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    )
    _write_member_gz(str(d / "orphan.warc.gz"), [rec])
    # a commit manifest that lists NOTHING (hides orphan from listings)
    cdir = d / "_warc_commits"
    cdir.mkdir()
    (cdir / "commit-x.json").write_text(json.dumps({"files": []}))
    # directory form: manifest is authoritative -> empty -> raises
    with pytest.raises(FileNotFoundError):
        bio.read_warc_gz(spark, str(d)).count()
    # exact-file form: read as given
    assert bio.read_warc_gz(spark, str(d / "orphan.warc.gz")).count() == 1
    # glob form still honors the manifest
    with pytest.raises(FileNotFoundError):
        bio.read_warc_gz(spark, str(d / "*.warc.gz")).count()


# ------------------- group blobs through the log-store seam -----------


class _PrefixLogStore:
    """Log store that refuses raw POSIX paths: every mdir must carry
    a fake scheme, remapped under root — any group-blob I/O that
    bypasses the seam fails loudly (mirrors fs.PrefixArchiveFS)."""

    def __init__(self, scheme, root):
        self.scheme = scheme
        self.root = root

    def _map(self, p):
        prefix = f"{self.scheme}://"
        assert p.startswith(prefix), f"raw path reached log store: {p!r}"
        return os.path.join(self.root, p[len(prefix):])

    def list_versions(self, mdir):
        from bigdata_foundation_spark.io import PosixSnapshotLogStore

        return PosixSnapshotLogStore().list_versions(self._map(mdir))

    def read(self, mdir, version):
        from bigdata_foundation_spark.io import PosixSnapshotLogStore

        return PosixSnapshotLogStore().read(self._map(mdir), version)

    def publish(self, mdir, version, manifest):
        from bigdata_foundation_spark.io import PosixSnapshotLogStore

        os.makedirs(self._map(mdir), exist_ok=True)
        return PosixSnapshotLogStore().publish(self._map(mdir), version, manifest)

    def delete(self, mdir, version):
        from bigdata_foundation_spark.io import PosixSnapshotLogStore

        PosixSnapshotLogStore().delete(self._map(mdir), version)

    def put_blob(self, mdir, name, payload):
        from bigdata_foundation_spark.io import PosixSnapshotLogStore

        PosixSnapshotLogStore().put_blob(self._map(mdir), name, payload)

    def read_blob(self, mdir, name):
        from bigdata_foundation_spark.io import PosixSnapshotLogStore

        return PosixSnapshotLogStore().read_blob(self._map(mdir), name)

    def list_blobs(self, mdir):
        from bigdata_foundation_spark.io import PosixSnapshotLogStore

        return PosixSnapshotLogStore().list_blobs(self._map(mdir))

    def delete_blob(self, mdir, name):
        from bigdata_foundation_spark.io import PosixSnapshotLogStore

        PosixSnapshotLogStore().delete_blob(self._map(mdir), name)


def test_check_log_store_probes_blob_contract(tmp_path):
    from bigdata_foundation_spark.io import (
        PosixSnapshotLogStore,
        check_log_store,
    )

    check_log_store(PosixSnapshotLogStore(), str(tmp_path))

    class _NoBlobs(PosixSnapshotLogStore):
        put_blob = None

    with pytest.raises((ValueError, TypeError)):
        check_log_store(_NoBlobs(), str(tmp_path / "nb"))


def test_v2_manifest_rides_log_store_for_group_blobs(spark, tmp_path, monkeypatch):
    """With a scheme-only log store installed, a v2 lineage (shard
    threshold forced low) commits, reads, merges, and vacuums with
    ZERO raw-POSIX group-blob I/O — r14 advice (medium): blobs were
    open()/os.listdir'd directly, so a non-POSIX log store published
    manifests referencing blobs that existed only on the driver."""
    from bigdata_foundation_spark import io as bio

    root = str(tmp_path / "backing")
    store = _PrefixLogStore("logx", root)
    old = bio.get_snapshot_log_store()
    monkeypatch.setattr(bio, "_LOG_STORE", store)
    monkeypatch.setattr(bio, "_SNAPSHOT_SHARD_THRESHOLD", 4)
    monkeypatch.setattr(bio, "_SNAPSHOT_GROUP_TARGET", 3)

    # the DATA dir stays POSIX (parquet rides Spark's FS layer); only
    # the manifest dir is scheme-mapped. _snapshot_paths joins both
    # from table_dir, so give the log store a passthrough for the
    # data half by using a real dir and patching _snapshot_paths.
    tdir = str(tmp_path / "tbl")
    ddir = os.path.join(tdir, "data")
    mdir_scheme = "logx://tbl-manifests"

    monkeypatch.setattr(
        bio, "_snapshot_paths", lambda table_dir: (ddir, mdir_scheme)
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "k int, v double"
    ).repartition(8)
    bio.write_snapshot(df, tdir, mode="overwrite")
    man = bio._read_manifest(tdir, 1)
    assert "groups" in man, "shard threshold should have forced v2"
    got = bio.read_at_version(spark, tdir, 1)
    assert got.count() == 40
    # merge rewrites touched groups through the seam
    ups = spark.createDataFrame([(1, 100.0), (999, 1.0)], "k int, v double")
    bio.snapshot_merge(spark, tdir, ups, ["k"])
    head = bio.read_at_version(spark, tdir)
    assert head.count() == 41
    assert head.filter(F.col("k") == 1).collect()[0]["v"] == 100.0
    # vacuum sweeps orphan blobs through the seam
    bio.snapshot_vacuum(tdir, keep_last=1, min_age_sec=0.0)
    assert bio.read_at_version(spark, tdir).count() == 41
    # and the blobs really live under the scheme root, not beside ddir
    blob_dir = os.path.join(root, "tbl-manifests", "groups")
    assert os.path.isdir(blob_dir) and len(os.listdir(blob_dir)) > 0
    assert not os.path.isdir(os.path.join(tdir, "data", "groups"))
    bio.set_snapshot_log_store(old)


# ------------------- change-feed multiplicity contract ----------------


def test_change_feed_duplicate_rows_collapse_documented(spark, tmp_path):
    """Pin the set-EXCEPT contract (r14 verdict task 6): a delete
    commit removing N identical rows emits the row ONCE in the feed
    (DISTINCT semantics) — the docstring states it, this test keeps
    it honest. Keyed consumers are unaffected (merge enforces key
    uniqueness); only keyless duplicate-row appends hit it."""
    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "dupfeed")
    base = spark.createDataFrame(
        [(1, 10.0), (1, 10.0), (2, 20.0)], "k int, v double"
    ).coalesce(1)
    v1 = bio.write_snapshot(base, tdir, mode="overwrite")
    v2 = bio.snapshot_delete(spark, tdir, F.col("k") == 1)
    feed = bio.read_version_changes(spark, tdir, v1, v2)
    rows = [(r["k"], r["v"], r["_change_type"]) for r in feed.collect()]
    # both (1, 10.0) copies were deleted, but EXCEPT DISTINCT emits one
    assert rows == [(1, 10.0, "delete")]
    assert "DISTINCT" in bio.read_version_changes.__doc__


# ------------------- streaming source: startingVersion after vacuum ---


def _commit_three(spark, bio, tdir):
    for i, cid in enumerate(["a", "b", "c"]):
        df = spark.createDataFrame(
            [(i * 10 + j, float(i)) for j in range(5)], "k int, v double"
        ).coalesce(1)
        bio.write_snapshot(
            df, tdir, mode="overwrite" if i == 0 else "append", commit_id=cid
        )


def _run_stream(spark, tdir, out, ckpt, **opts):
    reader = spark.readStream.format("snapshot_table").option("path", tdir)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_stream_starting_version_after_vacuum(spark, tmp_path):
    """A FRESH stream whose startingVersion is the oldest retained
    version must baseline from it, not raise 'vacuumed' (r14 advice:
    after any vacuum the only usable startingVersion was 1)."""
    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.source import register_snapshot_source

    register_snapshot_source(spark)
    tdir = str(tmp_path / "tbl")
    _commit_three(spark, bio, tdir)
    bio.snapshot_vacuum(tdir, keep_last=2, min_age_sec=0.0)
    assert bio.snapshot_versions(tdir) == [2, 3]
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # startingVersion=2: its predecessor (v1) is vacuumed — the stream
    # baselines on v2's full file set, then tails v3
    _run_stream(spark, tdir, out, ckpt, startingVersion="2")
    assert spark.read.parquet(out).count() == 15  # v2 holds all 10+5 rows
    # a CHECKPOINT-RESUME offset pointing at a vacuumed version still
    # raises (that is lost progress, not a fresh start)
    from bigdata_foundation_spark.streaming.source import SnapshotStreamReader
    from pyspark.sql.types import StructType

    rdr = SnapshotStreamReader(
        StructType.fromJson(bio._read_manifest(tdir, 2)["schema"]),
        {"path": tdir, "startingversion": "3"},
    )
    with pytest.raises(ValueError, match="vacuum"):
        rdr.partitions({"version": 1}, {"version": 3})


# ------------------- streaming source: rate limiting ------------------


def _backlog_table(spark, bio, tdir, n_commits=4):
    for i in range(n_commits):
        df = spark.createDataFrame(
            [(i * 10 + j, float(i)) for j in range(6)], "k int, v double"
        ).repartition(2)
        bio.write_snapshot(
            df, tdir, mode="overwrite" if i == 0 else "append", commit_id=f"c{i}"
        )


def test_stream_max_files_per_trigger_bounds_batches(spark, tmp_path):
    """maxFilesPerTrigger splits a multi-commit backlog into several
    micro-batches with bounded files each (r14 verdict task 2) —
    offsets advance at version granularity, every row arrives exactly
    once. processingTime trigger: latestOffset is consulted per
    micro-batch, so ONE query run drains the backlog in capped
    steps."""
    import time

    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.source import register_snapshot_source

    register_snapshot_source(spark)
    tdir = str(tmp_path / "tbl")
    _backlog_table(spark, bio, tdir)  # 4 commits x 2 files = 8 files
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", tdir)
        .option("maxFilesPerTrigger", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 24:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()
    assert spark.read.parquet(out).count() == 24
    # the offset log must show >1 batch (a single catch-up batch is
    # exactly what the cap exists to prevent): 8 files / cap 2 = 4
    offsets = [f for f in os.listdir(os.path.join(ckpt, "offsets")) if f.isdigit()]
    assert len(offsets) >= 4, f"expected >=4 micro-batches, got {sorted(offsets)}"


def test_stream_max_files_available_now_single_bounded_batch(spark, tmp_path):
    """Under availableNow Spark falls back to single-batch execution
    for Python sources (measured — no SupportsTriggerAvailableNow):
    each invocation processes ONE capped batch and checkpoints, so
    repeated runs drain the backlog incrementally with no loss and no
    duplicates."""
    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.source import register_snapshot_source

    register_snapshot_source(spark)
    tdir = str(tmp_path / "tbl")
    _backlog_table(spark, bio, tdir)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    counts = []
    for _ in range(6):
        _run_stream(spark, tdir, out, ckpt, maxFilesPerTrigger="2")
        try:
            counts.append(spark.read.parquet(out).count())
        except Exception:
            counts.append(0)
        if counts[-1] >= 24:
            break
    assert counts[-1] == 24, counts
    # progress was incremental (first run bounded to ~1 version), and
    # re-running at head emits nothing new
    assert counts[0] < 24, counts
    _run_stream(spark, tdir, out, ckpt, maxFilesPerTrigger="2")
    assert spark.read.parquet(out).count() == 24


def test_stream_rate_limit_planner_is_version_granular():
    """Unit-level: the capped offset walks versions, always advancing
    at least one version, never splitting a version."""
    from bigdata_foundation_spark.streaming.source import _capped_end

    n_files = {1: 4, 2: 1, 3: 1, 4: 3}
    # base 0, cap 2: v1 alone exceeds the cap but MUST be taken
    assert _capped_end(0, [1, 2, 3, 4], n_files, 2) == 1
    # base 1, cap 2: v2+v3 fit, v4 would exceed
    assert _capped_end(1, [1, 2, 3, 4], n_files, 2) == 3
    # base 3, cap 10: everything fits
    assert _capped_end(3, [1, 2, 3, 4], n_files, 10) == 4
    # base 4: nothing pending
    assert _capped_end(4, [1, 2, 3, 4], n_files, 2) == 4


def test_stream_max_bytes_per_trigger_bounds_batches(spark, tmp_path):
    """maxBytesPerTrigger budgets the offset advance on the new
    files' on-disk size — with a 1-byte budget every version exceeds
    it, so each (availableNow single-batch) run advances exactly one
    version."""
    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.source import register_snapshot_source

    register_snapshot_source(spark)
    tdir = str(tmp_path / "tbl")
    _backlog_table(spark, bio, tdir)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    counts = []
    for _ in range(5):
        _run_stream(spark, tdir, out, ckpt, maxBytesPerTrigger="1")
        counts.append(spark.read.parquet(out).count())
    # one 6-row version per run
    assert counts == [6, 12, 18, 24, 24], counts


# ------------------- streaming change feed ----------------------------


def test_stream_change_feed_matches_batch(spark, tmp_path):
    """readChangeFeed=true streams the typed change rows of each new
    commit; the union over the lineage equals the batch
    read_version_changes answer (r14 verdict task 3)."""
    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.source import register_snapshot_source

    register_snapshot_source(spark)
    tdir = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, float(i * 10)) for i in range(20)], "k int, v double"
    ).repartitionByRange(4, "k")
    v1 = bio.write_snapshot(base, tdir, mode="overwrite", commit_id="b")
    ups = spark.createDataFrame(
        [(2, 999.0), (100, 1.0)], "k int, v double"
    )
    bio.snapshot_merge(spark, tdir, ups, ["k"], commit_id="m")
    v3 = bio.snapshot_delete(spark, tdir, F.col("k") >= 15, commit_id="d")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _run_stream(
        spark, tdir, out, ckpt,
        readChangeFeed="true", keyCols="k", startingVersion=str(v1 + 1),
    )
    got = sorted(
        (r["k"], r["v"], r["_change_type"], r["_commit_version"])
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["k"], r["v"], r["_change_type"], r["_commit_version"])
        for r in bio.read_version_changes(
            spark, tdir, v1, v3, key_cols=["k"]
        ).collect()
    )
    assert got == want
    # typed classification really happened
    kinds = {t for _, _, t, _ in got}
    assert kinds == {"insert", "update_postimage", "delete"}


def test_change_feed_preimages_batch_and_stream(spark, tmp_path):
    """include_preimages / includePreimages emits each update's
    pre-image row (Delta CDF's four-type surface) identically in the
    batch API and the streaming mode."""
    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.source import register_snapshot_source

    register_snapshot_source(spark)
    tdir = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, float(i * 10)) for i in range(10)], "k int, v double"
    ).coalesce(2)
    v1 = bio.write_snapshot(base, tdir, mode="overwrite", commit_id="b")
    ups = spark.createDataFrame([(3, -1.0), (50, 5.0)], "k int, v double")
    v2 = bio.snapshot_merge(spark, tdir, ups, ["k"], commit_id="m")
    feed = bio.read_version_changes(
        spark, tdir, v1, v2, key_cols=["k"], include_preimages=True
    )
    rows = sorted(
        (r["k"], r["v"], r["_change_type"]) for r in feed.collect()
    )
    assert rows == [
        (3, -1.0, "update_postimage"),
        (3, 30.0, "update_preimage"),
        (50, 5.0, "insert"),
    ]
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _run_stream(
        spark, tdir, out, ckpt,
        readChangeFeed="true", keyCols="k", includePreimages="true",
        startingVersion=str(v1 + 1),
    )
    got = sorted(
        (r["k"], r["v"], r["_change_type"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == rows


def test_stream_change_feed_restart_is_exactly_once(spark, tmp_path):
    """Restarting the CDF stream after new commits emits ONLY the new
    commits' changes (offset checkpointing holds for the CDF mode
    too)."""
    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.source import register_snapshot_source

    register_snapshot_source(spark)
    tdir = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k int, v double"
    ).coalesce(1)
    bio.write_snapshot(base, tdir, mode="overwrite", commit_id="b")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _run_stream(spark, tdir, out, ckpt, readChangeFeed="true", keyCols="k",
                startingVersion="2")
    assert not os.path.exists(out) or spark.read.parquet(out).count() == 0
    bio.snapshot_delete(spark, tdir, F.col("k") < 3, commit_id="d1")
    _run_stream(spark, tdir, out, ckpt, readChangeFeed="true", keyCols="k",
                startingVersion="2")
    first = spark.read.parquet(out).count()
    assert first == 3
    # replay with no new commits: nothing re-emitted
    _run_stream(spark, tdir, out, ckpt, readChangeFeed="true", keyCols="k",
                startingVersion="2")
    assert spark.read.parquet(out).count() == 3


def test_stream_change_feed_overwrite_raises(spark, tmp_path):
    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.source import register_snapshot_source

    register_snapshot_source(spark)
    tdir = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, 1.0)], "k int, v double")
    bio.write_snapshot(df, tdir, mode="overwrite", commit_id="b")
    bio.write_snapshot(df, tdir, mode="overwrite", commit_id="o2")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="overwrite|rewrite|restart"):
        _run_stream(spark, tdir, out, ckpt, readChangeFeed="true",
                    startingVersion="2")


# ------------------- v2 group compaction ------------------------------


def test_v2_small_appends_compact_groups(spark, tmp_path, monkeypatch):
    """Sustained small appends / rewrites must not fragment the v2
    manifest into many tiny group blobs (r14 verdict task 4): at
    commit time undersized groups are re-chunked toward the target."""
    from bigdata_foundation_spark import io as bio

    monkeypatch.setattr(bio, "_SNAPSHOT_SHARD_THRESHOLD", 2)
    monkeypatch.setattr(bio, "_SNAPSHOT_GROUP_TARGET", 8)
    tdir = str(tmp_path / "tbl")
    df0 = spark.createDataFrame(
        [(i, float(i)) for i in range(12)], "k int, v double"
    ).repartition(3)
    bio.write_snapshot(df0, tdir, mode="overwrite")
    for i in range(10):
        d = spark.createDataFrame([(100 + i, 1.0)], "k int, v double").coalesce(1)
        bio.write_snapshot(d, tdir, mode="append", commit_id=f"a{i}")
    man = bio._read_manifest(tdir, bio.snapshot_versions(tdir)[-1])
    assert "groups" in man
    n_files = bio._manifest_n_files(man)
    assert n_files == 13
    # without compaction this is 11 groups (one per commit); with
    # re-chunking toward target 8 it is ceil(13/8) = 2
    assert len(man["groups"]) <= 3, [g["n"] for g in man["groups"]]
    # and the data still reads back exactly
    assert bio.read_at_version(spark, tdir).count() == 22


def test_v2_pruned_merge_skips_unrelated_group_blobs(spark, tmp_path, monkeypatch):
    """A merge whose key range maps to one group must not OPEN the
    other groups' blobs when rewriting the manifest (r15: drop_ranges
    group skipping — at 1e6 files this is one blob read per merge vs
    a full metadata parse)."""
    from bigdata_foundation_spark import io as bio

    monkeypatch.setattr(bio, "_SNAPSHOT_SHARD_THRESHOLD", 2)
    monkeypatch.setattr(bio, "_SNAPSHOT_GROUP_TARGET", 4)
    tdir = str(tmp_path / "tbl")
    df0 = spark.createDataFrame(
        [(i, float(i)) for i in range(32)], "k int, v double"
    ).repartitionByRange(16, "k")
    bio.write_snapshot(df0, tdir, mode="overwrite")  # 16 files -> 4 groups
    man = bio._read_manifest(tdir, 1)
    assert len(man["groups"]) == 4

    opened = []
    orig = bio._read_file_group

    def counting(mdir, ref):
        opened.append(ref["path"])
        return orig(mdir, ref)

    monkeypatch.setattr(bio, "_read_file_group", counting)
    ups = spark.createDataFrame([(1, 999.0)], "k int, v double")
    bio.snapshot_merge(spark, tdir, ups, ["k"])
    # candidate bounding opens intersecting groups once (planning) and
    # the payload rewrite opens the touched group — but never all 4
    assert len(set(opened)) < 4, set(opened)
    head = bio.read_at_version(spark, tdir)
    assert head.count() == 32
    assert head.filter(F.col("k") == 1).collect()[0]["v"] == 999.0


def test_v2_rewrite_churn_keeps_groups_chunked(spark, tmp_path, monkeypatch):
    """Fine-grained merges rewrite touched groups; survivors must be
    re-chunked with the round's new files, not left as shrinking
    orphan blobs."""
    from bigdata_foundation_spark import io as bio

    monkeypatch.setattr(bio, "_SNAPSHOT_SHARD_THRESHOLD", 2)
    monkeypatch.setattr(bio, "_SNAPSHOT_GROUP_TARGET", 6)
    tdir = str(tmp_path / "tbl")
    df0 = spark.createDataFrame(
        [(i, float(i)) for i in range(24)], "k int, v double"
    ).repartitionByRange(12, "k")
    bio.write_snapshot(df0, tdir, mode="overwrite")
    for i in range(6):
        ups = spark.createDataFrame([(i * 4, 999.0)], "k int, v double")
        bio.snapshot_merge(spark, tdir, ups, ["k"], commit_id=f"m{i}")
    man = bio._read_manifest(tdir, bio.snapshot_versions(tdir)[-1])
    assert "groups" in man
    total = bio._manifest_n_files(man)
    import math

    assert len(man["groups"]) <= math.ceil(total / 6) + 1, [
        g["n"] for g in man["groups"]
    ]
    head = bio.read_at_version(spark, tdir)
    assert head.count() == 24
    assert head.filter(F.col("v") == 999.0).count() == 6


# ------------------- commit-id index ----------------------------------


def test_commit_id_idempotency_with_index(spark, tmp_path):
    """The incremental commit-id index preserves the idempotency
    contract: replays return the original version; vacuumed commit
    ids are FORGOTTEN (replay re-commits, the pre-index behavior);
    a recreated table resets the per-process cache."""
    import shutil

    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, 1.0)], "k int, v double")
    v1 = bio.write_snapshot(df, tdir, mode="overwrite", commit_id="a")
    v2 = bio.write_snapshot(df, tdir, mode="append", commit_id="b")
    # replay: same version back, no new commit
    assert bio.write_snapshot(df, tdir, mode="append", commit_id="b") == v2
    assert bio.snapshot_versions(tdir)[-1] == v2
    # merge/delete idempotency rides the same index
    v3 = bio.snapshot_merge(
        spark, tdir, spark.createDataFrame([(1, 9.0)], "k int, v double"),
        ["k"], commit_id="m",
    )
    assert bio.snapshot_merge(
        spark, tdir, spark.createDataFrame([(1, 9.0)], "k int, v double"),
        ["k"], commit_id="m",
    ) == v3
    # vacuum drops v1/v2 -> commit_id 'b' is forgotten; replay
    # RE-COMMITS (exact pre-index semantics)
    bio.snapshot_vacuum(tdir, keep_last=1, min_age_sec=0.0)
    v4 = bio.write_snapshot(df, tdir, mode="append", commit_id="b")
    assert v4 > v3
    # recreated table: log restarts below the cached head -> reset
    shutil.rmtree(tdir)
    nv1 = bio.write_snapshot(df, tdir, mode="overwrite", commit_id="z")
    assert nv1 == 1
    assert bio.write_snapshot(df, tdir, mode="append", commit_id="b") == 2
