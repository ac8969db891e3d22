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

Usage: python tools/manifest_scale_bench.py [out_dir]
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

    return {
        "fmt": fmt,
        "n_files": n_files,
        "manifest_mb": round(man_bytes / 1e6, 2),
        "manifest_read_s": round(t_read, 3),
        "prune_plan_s": round(t_plan, 3),
        "pruned_collect_s": round(t_collect, 3),
        "append_commit_s": round(t_append, 3),
        "merge_5rows_s": round(t_merge, 3),
        "n_manifest_files": bio._manifest_n_files(man),
    }


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="manbench_")
    spark = get_spark(app_name="manifest-scale-bench", master="local[8]", shuffle_partitions=8)
    print(
        "| fmt | n_files | metadata MB | read s | prune-plan s | pruned-collect s "
        "| append-commit s | merge-5-rows s |"
    )
    print("| --- | --- | --- | --- | --- | --- | --- | --- |")
    rows = []
    for fmt in ("v1", "v2"):
        for n in (1_000, 10_000, 100_000):
            r = bench(spark, root, n, fmt)
            rows.append(r)
            print(
                f"| {r['fmt']} | {r['n_files']:,} | {r['manifest_mb']} "
                f"| {r['manifest_read_s']} "
                f"| {r['prune_plan_s']} | {r['pruned_collect_s']} "
                f"| {r['append_commit_s']} | {r['merge_5rows_s']} |",
                flush=True,
            )
    print(json.dumps(rows))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
