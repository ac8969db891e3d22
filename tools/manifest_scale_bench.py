"""Manifest metadata cost at file-count scale (r13 verdict task 2).

Synthesizes snapshot tables whose HEAD manifest references N data
files (hardlinks of one real parquet file — this is a METADATA
benchmark; the data plane is constant) with tight per-file key
ranges, then measures the metadata-bound operations:

- manifest read+parse (the floor under EVERY snapshot op);
- read_at_version with a 1-file selective prune: plan-build time
  (prune math + DataFrame construction) and collect;
- append commit (write_snapshot of one small frame onto the N-file
  head — serializes the whole manifest);
- snapshot_merge of 5 rows with a tight key range (candidate
  bounding + probe + rewrite + commit).

r15 additions (r14 verdict task 4): ``--big`` runs a v2-only cell at
1e6 files (v1 at that scale is the measured-linear extrapolation —
~23 s/commit — and would dominate the run for no new information);
``--churn`` runs the REWRITE-CHURN cell: 10,000 drop-1-add-1 commits
through the real _build_manifest_file_payload on a 20,000-file v2
table, with and without commit-time partial-group compaction,
recording group-refs-per-manifest and total payload-build time. The
churn loop is driver-side metadata only (no Spark jobs) because the
thing under test IS the manifest payload builder — a real merge adds
a constant Spark probe/rewrite cost on top that does not depend on
group fragmentation.

Usage: python tools/manifest_scale_bench.py [out_dir] [--big] [--churn]
Prints one markdown table row per N.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_foundation_spark import io as bio  # noqa: E402
from bigdata_foundation_spark.session import get_spark  # noqa: E402

ROWS_PER_FILE = 100


def build_table(spark, root: str, n_files: int, fmt: str = "v1") -> str:
    """Snapshot table whose head manifest lists n_files entries, each
    covering a disjoint k-range of ROWS_PER_FILE keys (file i: stats
    k in [i*R, i*R+R-1]). One real parquet file, hardlinked.
    ``fmt='v2'`` publishes the head as a SHARDED manifest (group blobs
    via the real _write_file_group API)."""
    tdir = os.path.join(root, f"tbl_{fmt}_{n_files}")
    seed = (
        spark.range(0, ROWS_PER_FILE)
        .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
        .coalesce(1)
    )
    bio.write_snapshot(seed, tdir, mode="overwrite")
    man1 = bio._read_manifest(tdir, 1)
    ddir, mdir = bio._snapshot_paths(tdir)
    src_rel = man1["files"][0]
    src = os.path.join(ddir, src_rel)
    cdir = os.path.join(ddir, "c-synth")
    os.makedirs(cdir, exist_ok=True)
    files, stats = [], {}
    link_src = src
    for i in range(n_files):
        rel = os.path.join("c-synth", f"f{i:06d}.parquet")
        if i % 60_000 == 0 and i > 0:
            # ext4 caps hardlinks per inode (~65k): rotate a fresh copy
            link_src = os.path.join(cdir, f"src{i}.parquet.src")
            shutil.copyfile(src, link_src)
        os.link(link_src, os.path.join(ddir, rel))
        files.append(rel)
        lo = i * ROWS_PER_FILE
        stats[rel] = {
            "k": [lo, lo + ROWS_PER_FILE - 1],
            "v": [lo * 2.0, (lo + ROWS_PER_FILE - 1) * 2.0],
        }
    manifest = {
        "version": 2,
        "parent": 1,
        "mode": "overwrite",
        "commit_id": None,
        "committed_at": time.time(),
        "schema": man1["schema"],
    }
    if fmt == "v2":
        groups = [
            bio._write_file_group(
                mdir,
                files[i : i + bio._SNAPSHOT_GROUP_TARGET],
                stats,
            )
            for i in range(0, len(files), bio._SNAPSHOT_GROUP_TARGET)
        ]
        manifest.update({"format": 2, "groups": groups})
    else:
        manifest.update({"files": files, "stats": stats})
    assert bio.get_snapshot_log_store().publish(mdir, 2, manifest)
    return tdir


def bench(spark, root: str, n_files: int, fmt: str = "v1") -> dict:
    tdir = build_table(spark, root, n_files, fmt)
    _, mdir = bio._snapshot_paths(tdir)

    t0 = time.perf_counter()
    man = bio._read_manifest(tdir, 2)
    t_read = time.perf_counter() - t0
    man_bytes = os.path.getsize(os.path.join(mdir, "v00000002.json"))
    if "groups" in man:
        gdir = os.path.join(mdir, "groups")
        man_bytes += sum(
            os.path.getsize(os.path.join(gdir, g)) for g in os.listdir(gdir)
        )

    # selective read: prune to ONE file's k-range
    mid = (n_files // 2) * ROWS_PER_FILE
    t0 = time.perf_counter()
    df = bio.read_at_version(
        spark, tdir, 2, prune=[("k", mid, mid + ROWS_PER_FILE - 1)]
    )
    t_plan = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = df.count()
    t_collect = time.perf_counter() - t0
    assert n == ROWS_PER_FILE, n

    # append commit onto the N-file head
    extra = (
        spark.range(0, 10)
        .select(
            (F.col("id") + n_files * ROWS_PER_FILE).alias("k"),
            (F.col("id") * 2.0).alias("v"),
        )
        .coalesce(1)
    )
    t0 = time.perf_counter()
    bio.write_snapshot(extra, tdir, mode="append")
    t_append = time.perf_counter() - t0

    # tight merge: 5 rows into one file's range
    upd = spark.createDataFrame(
        [(mid + j, -1.0) for j in range(5)], "k bigint, v double"
    )
    t0 = time.perf_counter()
    bio.snapshot_merge(spark, tdir, upd, ["k"])
    t_merge = time.perf_counter() - t0

    # vacuum: drop all but the head — the sweep walks every data file
    # on disk (O(files) stat+listdir) plus the blob sweep via the log
    # store; min_age_sec=0 so the dropped versions' files actually go
    t0 = time.perf_counter()
    n_deleted = bio.snapshot_vacuum(tdir, keep_last=1, min_age_sec=0.0)
    t_vacuum = time.perf_counter() - t0

    return {
        "fmt": fmt,
        "n_files": n_files,
        "manifest_mb": round(man_bytes / 1e6, 2),
        "manifest_read_s": round(t_read, 3),
        "prune_plan_s": round(t_plan, 3),
        "pruned_collect_s": round(t_collect, 3),
        "append_commit_s": round(t_append, 3),
        "merge_5rows_s": round(t_merge, 3),
        "vacuum_s": round(t_vacuum, 3),
        "vacuum_deleted": n_deleted,
        "n_manifest_files": bio._manifest_n_files(man),
    }


def churn_bench(
    spark, root: str, n_files: int, n_commits: int, compact: bool
) -> dict:
    """Rewrite churn against the REAL payload builder: each commit
    drops one (rotating) original file and adds one new file —
    the manifest shape a sustained fine-grained merge stream
    produces. Records group-ref growth and payload-build cost."""
    tag = "compact" if compact else "nocompact"
    tdir = build_table(spark, root, n_files, "v2")
    # rebuild under a churn-specific dir name so arms don't collide
    _, mdir = bio._snapshot_paths(tdir)
    head = bio._read_manifest(tdir, 2)
    refs_before = len(head["groups"])
    version = 2
    t0 = time.perf_counter()
    for i in range(n_commits):
        j = i % n_files
        drop_rel = os.path.join("c-synth", f"f{j:06d}.parquet")
        new_rel = os.path.join("c-synth", f"{tag}-churn{i:06d}.parquet")
        lo = (n_files + i) * ROWS_PER_FILE
        payload = bio._build_manifest_file_payload(
            mdir,
            head,
            {drop_rel},
            [new_rel],
            {new_rel: {"k": [lo, lo + ROWS_PER_FILE - 1]}},
            compact=compact,
            # the dropped file's key range — what snapshot_merge/delete
            # pass so only intersecting groups' blobs are opened
            drop_ranges=[("k", j * ROWS_PER_FILE, j * ROWS_PER_FILE + ROWS_PER_FILE - 1)],
        )
        version += 1
        head = {
            "version": version,
            "parent": version - 1,
            "mode": "merge",
            "commit_id": None,
            "committed_at": time.time(),
            "schema": head["schema"],
            **payload,
        }
        assert bio.get_snapshot_log_store().publish(mdir, version, head)
    dt = time.perf_counter() - t0
    assert bio._manifest_n_files(head) == n_files
    man_bytes = os.path.getsize(os.path.join(mdir, f"v{version:08d}.json"))

    # commit-id idempotency on the churned (long) lineage: a NEW
    # commit id must not scan every historical manifest per commit
    # (r15 _find_commit_id index — first call amortizes the one-time
    # scan, the second is O(new versions) ≈ O(1))
    seed = (
        spark.range(0, 5)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .coalesce(1)
    )
    t0 = time.perf_counter()
    bio.write_snapshot(seed, tdir, mode="append", commit_id=f"{tag}-idx-1")
    t_cid_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    bio.write_snapshot(seed, tdir, mode="append", commit_id=f"{tag}-idx-2")
    t_cid_second = time.perf_counter() - t0

    return {
        "cell": f"churn-{tag}",
        "n_files": n_files,
        "n_commits": n_commits,
        "groups_before": refs_before,
        "groups_after": len(head["groups"]),
        "head_manifest_kb": round(man_bytes / 1e3, 1),
        "total_commit_s": round(dt, 2),
        "per_commit_ms": round(dt / n_commits * 1e3, 2),
        "commit_id_append_first_s": round(t_cid_first, 3),
        "commit_id_append_second_s": round(t_cid_second, 3),
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    root = args[0] if args else tempfile.mkdtemp(prefix="manbench_")
    spark = get_spark(app_name="manifest-scale-bench", master="local[8]", shuffle_partitions=8)
    rows = []
    if "--churn" in flags:
        print(
            "| cell | n_files | commits | groups before → after "
            "| head manifest KB | total s | per-commit ms |"
        )
        print("| --- | --- | --- | --- | --- | --- | --- |")
        # nocompact arm capped at 2,000 commits: its head manifest
        # grows one group ref per commit (that growth IS the finding)
        # and 1e4 versions × ~1.5 MB manifests would burn disk for
        # the same curve
        for compact, n_commits in ((False, 2_000), (True, 10_000)):
            r = churn_bench(spark, root, 20_000, n_commits, compact)
            rows.append(r)
            print(
                f"| {r['cell']} | {r['n_files']:,} | {r['n_commits']:,} "
                f"| {r['groups_before']} → {r['groups_after']} "
                f"| {r['head_manifest_kb']} | {r['total_commit_s']} "
                f"| {r['per_commit_ms']} |",
                flush=True,
            )
            shutil.rmtree(root, ignore_errors=True)
            os.makedirs(root, exist_ok=True)
    else:
        print(
            "| fmt | n_files | metadata MB | read s | prune-plan s | pruned-collect s "
            "| append-commit s | merge-5-rows s | vacuum s |"
        )
        print("| --- | --- | --- | --- | --- | --- | --- | --- | --- |")
        grid = [(fmt, n) for fmt in ("v1", "v2") for n in (1_000, 10_000, 100_000)]
        if "--big" in flags:
            grid.append(("v2", 1_000_000))
        for fmt, n in grid:
            r = bench(spark, root, n, fmt)
            rows.append(r)
            print(
                f"| {r['fmt']} | {r['n_files']:,} | {r['manifest_mb']} "
                f"| {r['manifest_read_s']} "
                f"| {r['prune_plan_s']} | {r['pruned_collect_s']} "
                f"| {r['append_commit_s']} | {r['merge_5rows_s']} "
                f"| {r['vacuum_s']} |",
                flush=True,
            )
    print(json.dumps(rows))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
