"""Round-14 operator tests: the r13 advice fixes (NULL-predicate
DELETE semantics, WARC writer task-commit protocol + commit manifest,
PSL exact-suffix hosts, empty-archive guard), plus the round's new
surface.
"""

import pytest
from pyspark.sql import functions as F

from bigdata_foundation_spark.operators import web as W


def _recs(prefix, n):
    return [
        f"WARC-Type: response\r\nWARC-Target-URI: https://{prefix}.com/{i}\r\n"
        f"Content-Length: 2\r\n\r\nok"
        for i in range(n)
    ]


# ------------------- snapshot_delete NULL semantics -------------------


def test_snapshot_delete_keeps_null_predicate_rows(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate is NULL do NOT
    match and must be KEPT — r13 advice (high): filter(~predicate)
    dropped them whenever they shared a file with a matching row."""
    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "nulldel")
    rows = [(1, 10.0), (2, None), (3, 50.0), (4, None), (5, 20.0)]
    df = spark.createDataFrame(rows, "k int, q double").coalesce(1)
    bio.write_snapshot(df, tdir, mode="overwrite")
    v2 = bio.snapshot_delete(spark, tdir, F.col("q") > 45.0)
    got = sorted(
        (r["k"], r["q"]) for r in bio.read_at_version(spark, tdir, v2).collect()
    )
    # only k=3 (q=50) matched; the NULL-q rows sharing its file stay
    assert got == [(1, 10.0), (2, None), (4, None), (5, 20.0)]


def test_snapshot_delete_all_null_predicate_is_noop(spark, tmp_path):
    """A predicate that is NULL for every row matches nothing: no new
    version is committed."""
    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "nulldel2")
    df = spark.createDataFrame([(1, None), (2, None)], "k int, q double")
    v1 = bio.write_snapshot(df.coalesce(1), tdir, mode="overwrite")
    v2 = bio.snapshot_delete(spark, tdir, F.col("q") > 0.0)
    assert v2 == v1 and bio.snapshot_versions(tdir)[-1] == v1


# ------------------- PSL exact-suffix hosts ---------------------------


def test_registered_domain_exact_suffix_is_null(spark):
    """A host that IS a public suffix has no registered domain — r13
    advice: these fell through every tier (all require a preceding
    dot) to the default 2-label extract and returned the suffix."""
    cases = [
        ("https://co.uk/", None),  # plain 2-label rule, host == rule
        ("https://www.co.uk/", None),  # www-strip lands ON the rule
        ("https://k12.ca.us/", None),  # plain 3-label rule
        ("https://shop9.kawasaki.jp/", None),  # host == one label + wildcard tail
        ("https://city.kawasaki.jp/", "city.kawasaki.jp"),  # exception wins
        ("https://kawasaki.jp/", "kawasaki.jp"),  # bare tail: '*' default rule
        ("https://example.co.uk/", "example.co.uk"),  # normal eTLD+1 unchanged
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r[0] for r in df.select(W.registered_domain("url")).collect()]
    assert got == [want for _, want in cases]


def test_psl_sql_replay_agrees_on_exact_suffix(spark):
    """The DuckDB CASE stays in lockstep on the exact-suffix family
    (including NULLs)."""
    import duckdb

    urls = [
        "https://co.uk/",
        "https://www.co.uk/",
        "https://shop9.kawasaki.jp/",
        "https://city.kawasaki.jp/",
        "https://kawasaki.jp/",
        "https://example.co.uk/",
        "https://k12.ca.us/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [r[0] for r in df.select(W.registered_domain("url")).collect()]
    host0 = (
        "regexp_replace(lower(regexp_extract(url, "
        "'^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?"
        "(\\[[^\\]/?#]*\\]|[^/:?#@]+)', 1)), '^\\[|\\]$', '', 'g')"
    )
    hostn = f"regexp_replace({host0}, '^www\\.', '', 'g')"
    sql = W.psl_domain_sql(host0, hostn)
    con = duckdb.connect()
    con.execute("create table u(url varchar)")
    for u in urls:
        con.execute("insert into u values (?)", [u])
    duck = [r[0] for r in con.execute(f"select {sql} from u").fetchall()]
    assert got == duck


# ------------------- WARC writer task-commit protocol ------------------


def test_warc_manifest_written_and_lists_all_parts(spark, tmp_path):
    """write_warc_gz publishes one commit file per write; readers see
    the union (concurrent publishes cannot lose each other — each
    write owns its uuid-named commit file, nothing is rewritten)."""
    import os

    from bigdata_foundation_spark.io import _read_warc_manifest, write_warc_gz

    out_dir = str(tmp_path / "man")
    df = spark.createDataFrame([(r,) for r in _recs("m", 12)], ["record"]).repartition(3)
    written = write_warc_gz(df, out_dir)
    assert _read_warc_manifest(out_dir) == {
        os.path.basename(f) for f, _ in written
    }
    # a second write appends ITS OWN commit file; visibility unions
    df2 = spark.createDataFrame([(r,) for r in _recs("n", 4)], ["record"]).coalesce(1)
    written2 = write_warc_gz(df2, out_dir)
    assert _read_warc_manifest(out_dir) == {
        os.path.basename(f) for f, _ in written
    } | {os.path.basename(f) for f, _ in written2}
    commits = os.listdir(os.path.join(out_dir, "_warc_commits"))
    assert len(commits) == 2  # one per write, none rewritten


def test_warc_manifest_grandfathers_preexisting_archive(spark, tmp_path):
    """The FIRST publish into a directory holding externally-produced
    .warc.gz files keeps them visible (r14 review: they were readable
    before the write; hiding them would vanish data)."""
    import gzip
    import os

    from bigdata_foundation_spark.io import read_warc_gz, write_warc_gz

    out_dir = str(tmp_path / "pre")
    os.makedirs(out_dir)
    ext = _recs("external", 5)
    with open(os.path.join(out_dir, "external-archive.warc.gz"), "wb") as fh:
        for r in ext:
            fh.write(gzip.compress(("WARC/1.0\r\n" + r + "\r\n\r\n").encode()))
    new = _recs("new", 3)
    write_warc_gz(
        spark.createDataFrame([(r,) for r in new], ["record"]).coalesce(1), out_dir
    )
    got = [r["record"] for r in read_warc_gz(spark, out_dir).collect()]
    assert sorted(got) == sorted(ext + new)


def test_warc_glob_read_honors_manifest(spark, tmp_path):
    """A GLOB input filters through the per-directory manifest too —
    orphans are invisible whichever input form the reader uses (r14
    review: the glob branch used to bypass it)."""
    import gzip
    import os

    from bigdata_foundation_spark.io import read_warc_gz, write_warc_gz

    out_dir = str(tmp_path / "glob")
    recs = _recs("g", 6)
    write_warc_gz(
        spark.createDataFrame([(r,) for r in recs], ["record"]).coalesce(1), out_dir
    )
    orphan = os.path.join(out_dir, "part-" + "ab" * 16 + ".warc.gz")
    with open(orphan, "wb") as fh:
        fh.write(
            gzip.compress(
                b"WARC/1.0\r\nWARC-Target-URI: https://orphan.com/\r\n\r\nok\r\n\r\n"
            )
        )
    got = [
        r["record"]
        for r in read_warc_gz(spark, out_dir + "/*.warc.gz").collect()
    ]
    assert sorted(got) == sorted(recs)


def test_archive_base_scheme_paths(tmp_path):
    """Non-directory scheme paths must not go through os.path.abspath
    (r14 review: 'x://a/f' would become '<cwd>/x:/a')."""
    from bigdata_foundation_spark.fs import PrefixArchiveFS
    from bigdata_foundation_spark.io import _archive_base

    fs = PrefixArchiveFS("arch", str(tmp_path))
    assert _archive_base("arch://a/x.warc.gz", fs) == "arch://a"
    import os

    os.makedirs(str(tmp_path / "d"))
    assert _archive_base("arch://d", fs) == "arch://d"


def test_warc_orphans_invisible_to_both_readers(spark, tmp_path):
    """A failed/speculative attempt's orphan .warc.gz (valid bytes,
    uuid name, NOT in the manifest) and its sidecar must be ignored by
    read_warc_gz AND read_warc_gz_indexed — r13 advice (medium)."""
    import gzip
    import os
    import shutil

    from bigdata_foundation_spark.io import (
        read_warc_gz,
        read_warc_gz_indexed,
        write_warc_gz,
    )

    out_dir = str(tmp_path / "orph")
    recs = _recs("real", 8)
    df = spark.createDataFrame([(r,) for r in recs], ["record"]).coalesce(1)
    write_warc_gz(df, out_dir, index=True)

    # plant an orphan: a fully-valid member-gzip file + sidecar that
    # no manifest entry names (as a duplicated retried attempt leaves)
    orphan = os.path.join(out_dir, "part-deadbeef.warc.gz")
    with open(orphan, "wb") as fh:
        blob = gzip.compress(
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://orphan.com/0\r\n"
            b"Content-Length: 2\r\n\r\nok\r\n\r\n"
        )
        fh.write(blob)
    committed_cdx = [
        f for f in os.listdir(os.path.join(out_dir, "_cdx")) if f.endswith(".parquet")
    ][0]
    # clone the real sidecar under the orphan's name with its file col
    import pandas as pd

    sc = pd.read_parquet(os.path.join(out_dir, "_cdx", committed_cdx))
    sc = sc.head(1).assign(file=orphan, offset=0, length=len(blob))
    sc.to_parquet(
        os.path.join(out_dir, "_cdx", "part-deadbeef.warc.gz.cdx.parquet"),
        index=False,
    )
    # a crashed-task leftover temp must also be invisible
    with open(orphan + ".inprogress", "wb") as fh:
        fh.write(b"\x1f\x8b partial garbage")
    shutil.copy(
        os.path.join(out_dir, "_cdx", committed_cdx),
        os.path.join(out_dir, "_cdx", ".leftover.inprogress"),
    )

    got_plain = [r["record"] for r in read_warc_gz(spark, out_dir).collect()]
    assert sorted(got_plain) == sorted(recs)
    got_idx = [r["record"] for r in read_warc_gz_indexed(spark, out_dir).collect()]
    assert sorted(got_idx) == sorted(recs)


def test_warc_indexed_read_dedups_duplicate_index_rows(spark, tmp_path):
    """Duplicate CDX rows (re-run build_warc_cdx / retried index task)
    must not double-decode members."""
    import os
    import shutil

    from bigdata_foundation_spark.io import read_warc_gz_indexed, write_warc_gz

    out_dir = str(tmp_path / "dupidx")
    recs = _recs("d", 6)
    df = spark.createDataFrame([(r,) for r in recs], ["record"]).coalesce(1)
    write_warc_gz(df, out_dir, index=True)
    cdx_dir = os.path.join(out_dir, "_cdx")
    src = [f for f in os.listdir(cdx_dir) if f.endswith(".parquet")][0]
    shutil.copy(
        os.path.join(cdx_dir, src), os.path.join(cdx_dir, "dup-copy.cdx.parquet")
    )
    got = [r["record"] for r in read_warc_gz_indexed(spark, out_dir).collect()]
    assert sorted(got) == sorted(recs)


def test_read_warc_gz_empty_dir_raises(spark, tmp_path):
    """An empty directory raises a clear FileNotFoundError, not
    repartition(0)'s IllegalArgumentException — r13 advice (low)."""
    import os

    from bigdata_foundation_spark.io import build_warc_cdx, read_warc_gz

    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(FileNotFoundError):
        read_warc_gz(spark, empty)
    with pytest.raises(FileNotFoundError):
        build_warc_cdx(spark, empty)


def test_warc_no_inprogress_left_behind(spark, tmp_path):
    """A successful write leaves no temp files — everything visible is
    committed and manifest-listed."""
    import os

    from bigdata_foundation_spark.io import write_warc_gz

    out_dir = str(tmp_path / "clean")
    df = spark.createDataFrame([(r,) for r in _recs("c", 10)], ["record"]).repartition(2)
    write_warc_gz(df, out_dir, index=True)
    leftovers = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(out_dir)
        for f in fs
        if f.endswith(".inprogress")
    ]
    assert leftovers == []


# ------------------- additive snapshot schema evolution ----------------


def test_snapshot_append_evolves_additive_schema(spark, tmp_path):
    """An append with a NEW nullable column widens the table schema;
    old files read as NULL for it at the head, while time travel to
    the pre-evolution version keeps the old shape."""
    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "evo")
    v1 = bio.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string").coalesce(1),
        tdir,
        mode="overwrite",
    )
    v2 = bio.write_snapshot(
        spark.createDataFrame([(3, "c", 7.5)], "k int, s string, score double").coalesce(1),
        tdir,
        mode="append",
    )
    head = bio.read_at_version(spark, tdir, v2)
    assert head.columns == ["k", "s", "score"]
    got = sorted((r["k"], r["s"], r["score"]) for r in head.collect())
    assert got == [(1, "a", None), (2, "b", None), (3, "c", 7.5)]
    old = bio.read_at_version(spark, tdir, v1)
    assert old.columns == ["k", "s"]
    # delta between the versions carries the evolved schema
    delta = bio.read_version_delta(spark, tdir, v1, v2)
    assert delta.columns == ["k", "s", "score"]
    assert [(r["k"], r["score"]) for r in delta.collect()] == [(3, 7.5)]


def test_snapshot_append_rejects_retype_and_drop(spark, tmp_path):
    """Type changes and dropped columns still refuse to append."""
    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "evo2")
    bio.write_snapshot(
        spark.createDataFrame([(1, "a")], "k int, s string").coalesce(1),
        tdir,
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="type"):
        bio.write_snapshot(
            spark.createDataFrame([(2, 3.0)], "k int, s double").coalesce(1),
            tdir,
            mode="append",
        )
    with pytest.raises(ValueError, match="missing"):
        bio.write_snapshot(
            spark.createDataFrame([(2,)], "k int").coalesce(1),
            tdir,
            mode="append",
        )


def test_snapshot_merge_evolves_additive_schema(spark, tmp_path):
    """A merge whose updates carry a new nullable column widens the
    table: matched rows take the update's value, untouched old files
    null-fill."""
    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "evo3")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k int, s string"
    )
    bio.write_snapshot(base.repartitionByRange(2, F.col("k")), tdir, mode="overwrite")
    upd = spark.createDataFrame([(2, "B", 0.9), (5, "E", 0.1)], "k int, s string, w double")
    v2 = bio.snapshot_merge(spark, tdir, upd, ["k"])
    got = sorted(
        (r["k"], r["s"], r["w"]) for r in bio.read_at_version(spark, tdir, v2).collect()
    )
    assert got == [
        (1, "a", None),
        (2, "B", 0.9),
        (3, "c", None),
        (4, "d", None),
        (5, "E", 0.1),
    ]
    # subsequent plain-schema ops still work on the evolved table:
    # delete reads mixed files through the widened schema
    v3 = bio.snapshot_delete(spark, tdir, F.col("w") < 0.5)
    got3 = sorted((r["k"], r["w"]) for r in bio.read_at_version(spark, tdir, v3).collect())
    assert got3 == [(1, None), (2, 0.9), (3, None), (4, None)]


def test_snapshot_merge_empty_updates_noop(spark, tmp_path):
    """An empty update frame is a no-op (no empty version minted)."""
    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "evo4")
    v1 = bio.write_snapshot(
        spark.createDataFrame([(1, "a")], "k int, s string").coalesce(1),
        tdir,
        mode="overwrite",
    )
    empty = spark.createDataFrame([], "k int, s string")
    assert bio.snapshot_merge(spark, tdir, empty, ["k"]) == v1
    assert bio.snapshot_versions(tdir)[-1] == v1


# ------------------- sharded manifests (format v2) ---------------------


@pytest.fixture()
def small_shards(monkeypatch):
    """Force tiny group/threshold sizes so small tables exercise v2."""
    from bigdata_foundation_spark import io as bio

    monkeypatch.setattr(bio, "_SNAPSHOT_SHARD_THRESHOLD", 4)
    monkeypatch.setattr(bio, "_SNAPSHOT_GROUP_TARGET", 3)
    return bio


def test_sharded_manifest_lifecycle(spark, tmp_path, small_shards):
    """v1 → v2 conversion on crossing the threshold, group carry-over
    by reference on merge, group rewrite on delete, reads/time-travel/
    delta identical to the flat format."""
    bio = small_shards
    tdir = str(tmp_path / "shard")
    base = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    # 8 files of 5 rows, range-sorted: tight disjoint k stats per file
    v1 = bio.write_snapshot(
        base.repartitionByRange(8, F.col("k")), tdir, mode="overwrite"
    )
    man1 = bio._read_manifest(tdir, v1)
    assert man1.get("format") == 2 and "files" not in man1
    assert sum(r["n"] for r in man1["groups"]) == 8
    assert bio.read_at_version(spark, tdir, v1).count() == 40

    # append: old groups carried BY REFERENCE, one new group
    v2 = bio.write_snapshot(
        spark.createDataFrame([(100, 1.0)], "k bigint, v double").coalesce(1),
        tdir,
        mode="append",
    )
    man2 = bio._read_manifest(tdir, v2)
    # FULL groups carry over by reference; partial groups (the tail +
    # the 1-file append) may be re-chunked by commit-time compaction
    # (r15 — fragmentation control), so only pin the full ones
    full1 = {r["path"] for r in man1["groups"] if r["n"] >= 3}
    assert full1 and full1 <= {r["path"] for r in man2["groups"]}
    assert bio.read_at_version(spark, tdir, v2).count() == 41
    assert bio.snapshot_history(tdir)[-1]["n_files"] == 9
    # delta across the append reads only the new file
    delta = bio.read_version_delta(spark, tdir, v1, v2)
    assert [(r["k"], r["v"]) for r in delta.collect()] == [(100, 1.0)]

    # merge touching ONE key: only the group holding it is rewritten
    v3 = bio.snapshot_merge(
        spark, tdir, spark.createDataFrame([(7, -7.0)], "k bigint, v double"), ["k"]
    )
    man3 = bio._read_manifest(tdir, v3)
    carried = {r["path"] for r in man2["groups"]} & {r["path"] for r in man3["groups"]}
    assert len(carried) >= len(man2["groups"]) - 1
    got = {r["k"]: r["v"] for r in bio.read_at_version(spark, tdir, v3).collect()}
    assert got[7] == -7.0 and len(got) == 41

    # delete with prune: group bounds skip non-intersecting groups
    v4 = bio.snapshot_delete(
        spark, tdir, F.col("k") >= 35, prune=[("k", 35, None)]
    )
    rows = sorted(r["k"] for r in bio.read_at_version(spark, tdir, v4).collect())
    assert rows == list(range(0, 35))
    # time travel still sees every older version
    assert bio.read_at_version(spark, tdir, v1).count() == 40
    assert bio.read_at_version(spark, tdir, v3).count() == 41


def test_sharded_manifest_group_prune_reads_fewer_groups(spark, tmp_path, small_shards):
    """A pruned read of a v2 table must not even OPEN blobs of groups
    whose bounds can't intersect (observed via a counting wrapper)."""
    bio = small_shards
    tdir = str(tmp_path / "gprune")
    base = spark.range(0, 60).select(
        F.col("id").alias("k"), (F.col("id") + 0.5).alias("v")
    )
    bio.write_snapshot(base.repartitionByRange(12, F.col("k")), tdir, mode="overwrite")
    man = bio._read_manifest(tdir, bio.snapshot_versions(tdir)[-1])
    n_groups = len(man["groups"])
    assert n_groups >= 3

    opened = []
    orig = bio._read_file_group

    def counting(mdir, ref):
        opened.append(ref["path"])
        return orig(mdir, ref)

    try:
        bio._read_file_group = counting
        df = bio.read_at_version(spark, tdir, prune=[("k", 10, 12)])
        # pruning is file-granular; the caller applies the row filter
        n = df.filter((F.col("k") >= 10) & (F.col("k") <= 12)).count()
    finally:
        bio._read_file_group = orig
    assert n == 3
    assert 0 < len(opened) < n_groups


def test_sharded_manifest_vacuum_sweeps_orphan_groups(spark, tmp_path, small_shards):
    """Vacuum deletes group blobs referenced only by dropped versions
    (age-guarded off for the test), keeps the head's."""
    import os

    bio = small_shards
    tdir = str(tmp_path / "gvac")
    base = spark.range(0, 30).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    bio.write_snapshot(base.repartitionByRange(6, F.col("k")), tdir, mode="overwrite")
    # a merge rewrites one group -> the old group blob becomes
    # unreferenced once the pre-merge version is vacuumed
    bio.snapshot_merge(
        spark, tdir, spark.createDataFrame([(3, -1.0)], "k bigint, v double"), ["k"]
    )
    _, mdir = bio._snapshot_paths(tdir)
    gdir = os.path.join(mdir, "groups")
    before = set(os.listdir(gdir))
    head_man = bio._read_manifest(tdir, bio.snapshot_versions(tdir)[-1])
    head_groups = {r["path"] for r in head_man["groups"]}
    assert head_groups < before  # at least one orphan candidate exists
    bio.snapshot_vacuum(tdir, keep_last=1, min_age_sec=0.0)
    after = set(os.listdir(gdir))
    assert after == head_groups
    assert bio.read_at_version(spark, tdir).count() == 30


def test_sharded_and_flat_lineages_mix(spark, tmp_path, monkeypatch):
    """A table whose early commits are v1 converts to v2 when it
    crosses the threshold; old v1 versions stay readable."""
    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "mix")
    base = spark.range(0, 10).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    v1 = bio.write_snapshot(base.repartitionByRange(2, F.col("k")), tdir, mode="overwrite")
    assert "files" in bio._read_manifest(tdir, v1)  # flat at default threshold
    monkeypatch.setattr(bio, "_SNAPSHOT_SHARD_THRESHOLD", 2)
    monkeypatch.setattr(bio, "_SNAPSHOT_GROUP_TARGET", 2)
    v2 = bio.write_snapshot(
        spark.createDataFrame([(50, 5.0)], "k bigint, v double").coalesce(1),
        tdir,
        mode="append",
    )
    man2 = bio._read_manifest(tdir, v2)
    assert man2.get("format") == 2
    assert bio.read_at_version(spark, tdir, v1).count() == 10
    assert bio.read_at_version(spark, tdir, v2).count() == 11


# ------------------- archive filesystem seam ---------------------------


def _gz_archive_bytes(recs):
    import gzip

    return b"".join(
        gzip.compress(("WARC/1.0\r\n" + r + "\r\n\r\n").encode()) for r in recs
    )


def test_archive_fs_contract_all_backends(tmp_path):
    """check_archive_fs passes for every shipped backend (the
    executable contract an object-store client must meet)."""
    from bigdata_foundation_spark.fs import (
        MemArchiveFS,
        PosixArchiveFS,
        PrefixArchiveFS,
        check_archive_fs,
    )

    check_archive_fs(PosixArchiveFS(), str(tmp_path / "posix"))
    check_archive_fs(
        PrefixArchiveFS("probe", str(tmp_path / "pref")), "probe://scratch"
    )
    check_archive_fs(MemArchiveFS(), "mem/scratch")


def test_archive_fs_detects_lying_backend(tmp_path):
    """A backend whose replace leaves the temp behind (copy-not-move)
    is rejected by the contract probe."""
    from bigdata_foundation_spark.fs import PosixArchiveFS, check_archive_fs

    class CopyNotMove(PosixArchiveFS):
        def replace(self, src, dst):
            import shutil

            shutil.copyfile(src, dst)  # leaves src behind

    with pytest.raises(ValueError, match="temp name"):
        check_archive_fs(CopyNotMove(), str(tmp_path / "lying"))


def test_read_warc_gz_through_memory_fs(spark):
    """The pure-read path runs entirely through the seam: the archive
    exists ONLY inside a MemArchiveFS (no POSIX path), and executors
    seek/read it via the pickled fs — any bypass raises."""
    from bigdata_foundation_spark.fs import MemArchiveFS
    from bigdata_foundation_spark.io import read_warc_gz

    recs = _recs("mem", 15)
    fs = MemArchiveFS({"memdir/a.warc.gz": _gz_archive_bytes(recs)})
    # small split size -> multiple byte-range tasks re-synchronize
    got = [
        r["record"]
        for r in read_warc_gz(spark, "memdir", target_split_bytes=256, fs=fs).collect()
    ]
    assert sorted(got) == sorted(recs)


def test_warc_write_read_roundtrip_through_prefix_fs(spark, tmp_path):
    """The WRITE half through the seam: write_warc_gz + build_warc_cdx
    target a fake-scheme namespace (PrefixArchiveFS) that raw POSIX
    calls cannot resolve — temp writes, renames, the commit manifest,
    and the re-read all route through fs."""
    import os

    from bigdata_foundation_spark.fs import PrefixArchiveFS
    from bigdata_foundation_spark.io import read_warc_gz, write_warc_gz

    root = str(tmp_path / "pfs")
    fs = PrefixArchiveFS("warcstore", root)
    recs = _recs("pfx", 9)
    df = spark.createDataFrame([(r,) for r in recs], ["record"]).repartition(2)
    written = write_warc_gz(df, "warcstore://crawl", fs=fs)
    assert sum(n for _, n in written) == 9
    assert all(f.startswith("warcstore://crawl/") for f, _ in written)
    # the commit metadata landed in the backend namespace
    assert os.listdir(os.path.join(root, "crawl", "_warc_commits"))
    got = [
        r["record"] for r in read_warc_gz(spark, "warcstore://crawl", fs=fs).collect()
    ]
    assert sorted(got) == sorted(recs)


def test_build_warc_cdx_through_prefix_fs(spark, tmp_path):
    """Index an archive living in the fake-scheme namespace; sidecars
    land there too, and the indexed read decodes members through the
    same fs (the index scan itself rides Spark's FS on the REAL path)."""
    import os

    from bigdata_foundation_spark.fs import PrefixArchiveFS
    from bigdata_foundation_spark.io import build_warc_cdx
    from pyspark.sql import functions as SF

    root = str(tmp_path / "pfs2")
    fs = PrefixArchiveFS("arch", root)
    recs = _recs("cdx", 7)
    os.makedirs(os.path.join(root, "a"))
    with open(os.path.join(root, "a", "x.warc.gz"), "wb") as fh:
        fh.write(_gz_archive_bytes(recs))
    n = build_warc_cdx(spark, "arch://a", fs=fs)
    assert n == 7
    sidecars = os.listdir(os.path.join(root, "a", "_cdx"))
    assert sidecars and all(s.endswith(".cdx.parquet") for s in sidecars)
    idx = spark.read.parquet(os.path.join(root, "a", "_cdx"))
    assert idx.count() == 7
    assert idx.filter(SF.col("file").startswith("arch://")).count() == 7


# ------------------- registered_domain_lookup (full-PSL scale path) ----


def _domain_pairs(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rx = [r[0] for r in df.select(W.registered_domain("url").alias("d")).collect()]
    lk = [
        r["d"]
        for r in W.registered_domain_lookup(df, "url", "d").select("d").collect()
    ]
    return rx, lk


def test_domain_lookup_agrees_on_fixture_families(spark):
    """The broadcast-lookup variant returns IDENTICAL values to the
    regex tiers on every PSL rule-kind family (incl. the r14
    exact-suffix NULLs and IP literals)."""
    urls = [
        "https://www.example.com/a",
        "https://news.site3.co.uk/b",
        "https://district3.k12.ca.us/z",
        "https://foo.ca.us/z",
        "https://a.b.shop2.kawasaki.jp/x",
        "https://Sub1.City.Kawasaki.JP/y",
        "https://x.anything.ck/",
        "https://deep.www.ck/",
        "https://1.2.3.4/q",
        "https://school.k12.tr/e",
        "https://co.uk/",
        "https://www.co.uk/",
        "https://k12.ca.us/",
        "https://shop9.kawasaki.jp/",
        "https://city.kawasaki.jp/",
        "https://kawasaki.jp/",
        "https://example.co.uk/",
        "https://[2001:DB8::7]/v6",
        "https://com/",
    ]
    rx, lk = _domain_pairs(spark, urls)
    assert rx == lk


def test_domain_lookup_agrees_on_synth_corpus(spark):
    """Whole-corpus agreement at sf0.001: zero mismatching rows
    between the regex and lookup variants on the synth URL corpus."""
    from bigdata_foundation_spark.queries import _synth_url

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    urls = d.select(_synth_url("doc_id").alias("url"))
    both = W.registered_domain_lookup(urls, "url", "lk").withColumn(
        "rx", W.registered_domain(F.col("url"))
    )
    mismatch = both.filter(
        ~(F.col("rx").eqNullSafe(F.col("lk")))
    ).count()
    assert mismatch == 0


def test_domain_lookup_agrees_under_stress_rules(spark):
    """Agreement holds with a full-PSL-sized synthetic rule set (the
    regime where only the lookup path is viable)."""
    import tools.psl_scale_probe as P

    exc, plain, wild = P.synth_rules()
    ce, cp, cw = W._load_psl()
    merged = ([e[1:] for e in exc] + ce, plain + cp, [w[2:] for w in wild] + cw)
    orig_load = W._load_psl
    orig = (W.PSL_EXCEPTION_RE, W.PSL_EXACT_SUFFIX_RE, W.PSL_TIERS)
    try:
        W._load_psl = lambda: merged
        W.PSL_EXCEPTION_RE, W.PSL_EXACT_SUFFIX_RE, W.PSL_TIERS = W._psl_compile()
        urls = [
            "https://a.s0001.zz/",
            "https://s0001.zz/",  # host IS a stress plain suffix -> NULL
            "https://x.t0003.s0003.zz/",
            "https://one.more.w005.zz/",  # wildcard *.w005.zz
            "https://city.w005.zz/",  # exception
            "https://w005.zz/",  # bare tail -> default
            "https://example.co.uk/",  # curated rules still present
            "https://co.uk/",
        ]
        rx, lk = _domain_pairs(spark, urls)
        assert rx == lk
        assert lk[1] is None and lk[4] == "city.w005.zz" and lk[5] == "w005.zz"
    finally:
        W._load_psl = orig_load
        W.PSL_EXCEPTION_RE, W.PSL_EXACT_SUFFIX_RE, W.PSL_TIERS = orig


# ------------------- snapshot_table streaming source -------------------


def _tail(spark, tdir, ckpt, **opts):
    from bigdata_foundation_spark.streaming.source import register_snapshot_source

    register_snapshot_source(spark)
    got = []
    reader = spark.readStream.format("snapshot_table").option("path", tdir)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreachBatch(
            lambda df, bid: got.append(sorted((r["k"], r["s"]) for r in df.collect()))
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return [rows for rows in got if rows]


def test_snapshot_source_initial_and_resume(spark, tmp_path):
    """A fresh stream emits the whole table; a checkpoint resume emits
    ONLY the commits that landed since (exactly-once tail)."""
    from bigdata_foundation_spark import io as bio

    tdir, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    bio.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string").coalesce(1),
        tdir,
        mode="overwrite",
    )
    bio.write_snapshot(
        spark.createDataFrame([(3, "c")], "k int, s string").coalesce(1),
        tdir,
        mode="append",
    )
    assert _tail(spark, tdir, ckpt) == [[(1, "a"), (2, "b"), (3, "c")]]
    bio.write_snapshot(
        spark.createDataFrame([(4, "d")], "k int, s string").coalesce(1),
        tdir,
        mode="append",
    )
    assert _tail(spark, tdir, ckpt) == [[(4, "d")]]
    # nothing new -> no non-empty batch
    assert _tail(spark, tdir, ckpt) == []


def test_snapshot_source_starting_version(spark, tmp_path):
    """startingVersion tails only commits at or after it."""
    from bigdata_foundation_spark import io as bio

    tdir, ckpt = str(tmp_path / "tbl2"), str(tmp_path / "ckpt2")
    bio.write_snapshot(
        spark.createDataFrame([(1, "a")], "k int, s string").coalesce(1),
        tdir,
        mode="overwrite",
    )
    bio.write_snapshot(
        spark.createDataFrame([(2, "b")], "k int, s string").coalesce(1),
        tdir,
        mode="append",
    )
    bio.write_snapshot(
        spark.createDataFrame([(3, "c")], "k int, s string").coalesce(1),
        tdir,
        mode="append",
    )
    assert _tail(spark, tdir, ckpt, startingVersion=3) == [[(3, "c")]]


def test_snapshot_source_rejects_rewrites_unless_ignored(spark, tmp_path):
    """A merge commit inside the range fails the stream by default
    (the file delta stops meaning appended rows); ignoreChanges=true
    skips the rewrite commit and keeps tailing appends."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "tbl3")
    bio.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string").coalesce(1),
        tdir,
        mode="overwrite",
    )
    bio.snapshot_merge(
        spark, tdir, spark.createDataFrame([(2, "B")], "k int, s string"), ["k"]
    )
    bio.write_snapshot(
        spark.createDataFrame([(9, "z")], "k int, s string").coalesce(1),
        tdir,
        mode="append",
    )
    # strict: a fresh stream sees v1 (baseline ok) then the merge -> fail
    with pytest.raises(StreamingQueryException, match="merge"):
        _tail(spark, tdir, str(tmp_path / "ckpt3a"))
    # ignoreChanges: baseline + later appends, merge skipped
    got = _tail(spark, tdir, str(tmp_path / "ckpt3b"), ignoreChanges="true")
    assert got == [[(1, "a"), (2, "b"), (9, "z")]]


def test_snapshot_source_schema_evolution_null_fill(spark, tmp_path):
    """A stream started AFTER an additive evolution null-fills the
    pre-evolution files; one started BEFORE projects evolved files
    down to its fixed schema."""
    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.source import register_snapshot_source

    register_snapshot_source(spark)
    tdir = str(tmp_path / "tbl4")
    bio.write_snapshot(
        spark.createDataFrame([(1, "a")], "k int, s string").coalesce(1),
        tdir,
        mode="overwrite",
    )
    bio.write_snapshot(
        spark.createDataFrame([(2, "b", 0.5)], "k int, s string, w double").coalesce(1),
        tdir,
        mode="append",
    )
    # post-evolution stream: widened schema, old file null-filled
    got = []
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", tdir)
        .option("startingVersion", 2)
        .load()
        .writeStream.foreachBatch(
            lambda df, bid: got.append(
                (df.columns, sorted((r["k"], r["w"]) for r in df.collect()))
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt4"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # startingVersion=2 anchors on the evolved manifest: only v2's file
    assert got == [(["k", "s", "w"], [(2, 0.5)])]
    # pre-evolution-schema stream over the whole lineage: w dropped,
    # old files fine
    got2 = _tail(spark, tdir, str(tmp_path / "ckpt4b"))
    assert got2 == [[(1, "a"), (2, "b")]]


# ------------------- r14 compositions ----------------------------------


def test_streaming_merge_sink_evolves_schema_mid_stream(spark, tmp_path):
    """A CDC feed that starts carrying a NEW nullable column mid-stream
    widens the table through the merge sink (evolution composes with
    foreach_batch_snapshot_merge)."""
    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.sinks import (
        foreach_batch_snapshot_merge,
    )

    tdir = str(tmp_path / "evo_sink")
    # base table does NOT have the w column yet
    bio.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string").coalesce(1),
        tdir,
        mode="overwrite",
    )
    # feed whose batches carry the widened schema
    feed = str(tmp_path / "feed")
    spark.createDataFrame(
        [(2, "B", 0.7), (3, "C", 0.9)], "k int, s string, w double"
    ).repartitionByRange(2, F.col("k")).write.parquet(feed)
    stream = (
        spark.readStream.schema("k int, s string, w double")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    foreach_batch_snapshot_merge(stream, tdir, ["k"])
    got = sorted(
        (r["k"], r["s"], r["w"]) for r in bio.read_at_version(spark, tdir).collect()
    )
    assert got == [(1, "a", None), (2, "B", 0.7), (3, "C", 0.9)]


def test_snapshot_source_vacuumed_offset_raises(spark, tmp_path):
    """Resuming a stream whose checkpointed offset version was vacuumed
    must raise (silent whole-table re-emit would break exactly-once)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from bigdata_foundation_spark import io as bio

    tdir, ckpt = str(tmp_path / "tblv"), str(tmp_path / "ckptv")
    bio.write_snapshot(
        spark.createDataFrame([(1, "a")], "k int, s string").coalesce(1),
        tdir,
        mode="overwrite",
    )
    assert _tail(spark, tdir, ckpt) == [[(1, "a")]]
    bio.write_snapshot(
        spark.createDataFrame([(2, "b")], "k int, s string").coalesce(1),
        tdir,
        mode="append",
    )
    bio.write_snapshot(
        spark.createDataFrame([(3, "c")], "k int, s string").coalesce(1),
        tdir,
        mode="append",
    )
    # drop v1 (the checkpointed offset) from the log
    bio.snapshot_vacuum(tdir, keep_last=2, min_age_sec=0.0)
    with pytest.raises(StreamingQueryException, match="no longer exists"):
        _tail(spark, tdir, ckpt)


def test_snapshot_table_to_table_cdc_pipeline(spark, tmp_path):
    """End-to-end exactly-once table sync: TAIL table A through the
    streaming source, MERGE each batch into table B — B converges to
    A's content, and a resumed run re-emits nothing."""
    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.sinks import (
        foreach_batch_snapshot_merge,
    )
    from bigdata_foundation_spark.streaming.source import register_snapshot_source

    register_snapshot_source(spark)
    a_dir, b_dir = str(tmp_path / "A"), str(tmp_path / "B")
    ckpt = str(tmp_path / "ckpt_ab")
    bio.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string").coalesce(1),
        a_dir,
        mode="overwrite",
    )
    bio.write_snapshot(
        spark.createDataFrame([(3, "c")], "k int, s string").coalesce(1),
        a_dir,
        mode="append",
    )

    def sync():
        stream = spark.readStream.format("snapshot_table").option("path", a_dir).load()
        return foreach_batch_snapshot_merge(
            stream, b_dir, ["k"], checkpoint_dir=ckpt
        )

    sync()
    as_rows = lambda d: sorted(
        (r["k"], r["s"]) for r in bio.read_at_version(spark, d).collect()
    )
    assert as_rows(b_dir) == [(1, "a"), (2, "b"), (3, "c")]
    b_head = bio.snapshot_versions(b_dir)[-1]
    # nothing new: resumed sync commits nothing
    sync()
    assert bio.snapshot_versions(b_dir)[-1] == b_head
    # more appends to A flow through incrementally
    bio.write_snapshot(
        spark.createDataFrame([(4, "d")], "k int, s string").coalesce(1),
        a_dir,
        mode="append",
    )
    sync()
    assert as_rows(b_dir) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


# ------------------- row-level change feed ------------------------------


def test_read_version_changes_classifies_exactly(spark, tmp_path):
    """Across append + merge + delete commits, the change feed emits
    exactly the rows that changed, typed — unchanged rows a rewrite
    happened to carry emit NOTHING."""
    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "cdf")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k int, s string"
    )
    v1 = bio.write_snapshot(base.coalesce(1), tdir, mode="overwrite")
    v2 = bio.write_snapshot(
        spark.createDataFrame([(5, "e")], "k int, s string").coalesce(1),
        tdir,
        mode="append",
    )
    # merge: update k=2, insert k=6 — k=1/3/4 share the rewritten file
    v3 = bio.snapshot_merge(
        spark,
        tdir,
        spark.createDataFrame([(2, "B"), (6, "f")], "k int, s string"),
        ["k"],
    )
    v4 = bio.snapshot_delete(spark, tdir, F.col("k") == 3)
    feed = bio.read_version_changes(spark, tdir, v1, v4, key_cols=["k"])
    got = sorted(
        (r["_commit_version"], r["_change_type"], r["k"], r["s"])
        for r in feed.collect()
    )
    assert got == [
        (v2, "insert", 5, "e"),
        (v3, "insert", 6, "f"),
        (v3, "update_postimage", 2, "B"),
        (v4, "delete", 3, "c"),
    ]
    # keyless fallback: the update becomes its delete+insert pair
    feed2 = bio.read_version_changes(spark, tdir, v1, v3)
    got2 = sorted(
        (r["_commit_version"], r["_change_type"], r["k"]) for r in feed2.collect()
    )
    assert got2 == [
        (v2, "insert", 5),
        (v3, "delete", 2),
        (v3, "insert", 2),
        (v3, "insert", 6),
    ]


def test_read_version_changes_refuses_overwrite(spark, tmp_path):
    """Overwrite (incl. compaction/zorder) commits have no bounded
    row-level diff — the feed refuses, naming the version."""
    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "cdf2")
    v1 = bio.write_snapshot(
        spark.createDataFrame([(1, "a")], "k int, s string").coalesce(1),
        tdir,
        mode="overwrite",
    )
    v2 = bio.write_snapshot(
        spark.createDataFrame([(2, "b")], "k int, s string").coalesce(1),
        tdir,
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="overwrite"):
        bio.read_version_changes(spark, tdir, v1, v2, key_cols=["k"])
    # empty range -> typed empty frame
    empty = bio.read_version_changes(spark, tdir, v2, v2, key_cols=["k"])
    assert empty.count() == 0
    assert "_change_type" in empty.columns


def test_read_version_changes_evolution_aware(spark, tmp_path):
    """Changes across an additive evolution project older commits'
    rows through the to_version schema (null-filled new column)."""
    from bigdata_foundation_spark import io as bio

    tdir = str(tmp_path / "cdf3")
    v1 = bio.write_snapshot(
        spark.createDataFrame([(1, "a")], "k int, s string").coalesce(1),
        tdir,
        mode="overwrite",
    )
    v2 = bio.write_snapshot(
        spark.createDataFrame([(2, "b")], "k int, s string").coalesce(1),
        tdir,
        mode="append",
    )
    v3 = bio.write_snapshot(
        spark.createDataFrame([(3, "c", 0.5)], "k int, s string, w double").coalesce(1),
        tdir,
        mode="append",
    )
    feed = bio.read_version_changes(spark, tdir, v1, v3, key_cols=["k"])
    got = sorted((r["k"], r["w"], r["_change_type"]) for r in feed.collect())
    assert got == [(2, None, "insert"), (3, 0.5, "insert")]


# ------------------- badwords filter ------------------------------------


def test_badwords_filter_semantics(spark):
    """Whole-word distinct-hit counting, max_hits threshold, phrase
    drop, NULL-text row kept (no three-valued-logic drop)."""
    from bigdata_foundation_spark.operators import text as TXm

    rows = [
        (1, "a clean doc about tables"),
        (2, "one SLOW query"),  # 1 hit, case-insensitive
        (3, "slow slow slow day"),  # 1 DISTINCT hit
        (4, "slow and broken spam"),  # 3 hits
        (5, "slowly is not slow-word but slowly"),  # no whole-word hit
        (6, "totally fast  table layout"),  # phrase (run of whitespace)
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    banned = ["slow", "broken", "spam"]
    kept = TXm.badwords_filter(
        df, banned, max_hits=1, phrases=["fast table"], keep_signal=True
    )
    got = {r["doc_id"]: r["n_banned_hits"] for r in kept.collect()}
    assert got == {1: 0, 2: 1, 3: 1, 5: 0, 7: 0}
    # strict C4 drop: any hit
    strict = TXm.badwords_filter(df, banned)
    assert sorted(r["doc_id"] for r in strict.collect()) == [1, 5, 6, 7]
    assert "n_banned_hits" not in strict.columns


def test_snapshot_source_over_sharded_manifests(spark, tmp_path, small_shards):
    """The streaming source plans batches through v2 group-ref
    manifests identically to flat ones."""
    bio = small_shards
    tdir, ckpt = str(tmp_path / "v2src"), str(tmp_path / "v2ckpt")
    base = spark.range(0, 30).select(
        F.col("id").alias("k"), F.concat(F.lit("s"), F.col("id")).alias("s")
    )
    bio.write_snapshot(base.repartitionByRange(6, F.col("k")), tdir, mode="overwrite")
    man = bio._read_manifest(tdir, 1)
    assert man.get("format") == 2  # really v2
    bio.write_snapshot(
        spark.createDataFrame([(100, "x")], "k bigint, s string").coalesce(1),
        tdir,
        mode="append",
    )
    got = _tail(spark, tdir, ckpt)
    assert len(got) == 1 and len(got[0]) == 31
    bio.write_snapshot(
        spark.createDataFrame([(101, "y")], "k bigint, s string").coalesce(1),
        tdir,
        mode="append",
    )
    assert _tail(spark, tdir, ckpt) == [[(101, "y")]]
