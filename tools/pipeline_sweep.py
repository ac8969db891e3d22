"""Pipeline-operator scale sweep: wall-clock for a representative slice
of the training-data-pipeline registry at every shipped sf (0.001 /
0.01 / 0.1 — 100× span), one warm session, min-of-1 per cell (the
cross-ROUND signal is bench.py's min-of-3; this table is about the
SCALING SHAPE within one boot).

Row counts are asserted non-zero, and the sf0.01 cell of each query is
the same code path the correctness gate value-checks — the sweep adds
the 10×-up and 10×-down points.

Usage:
    python tools/pipeline_sweep.py            # prints the markdown table
    python tools/pipeline_sweep.py --sf1      # adds a generated 10x (sf1) column

The sf1 decade (r9 — r8 verdict task 6) is GENERATED, not shipped:
each sf0.1 table is decade-extended 10x with id offsets and
deterministic per-copy mutations chosen so the copies are NOT
near-duplicates of their originals (documents: seeded word shuffle;
embeddings: 0.5·v + unit noise, cosine to the original ~0.45; events/orders:
user/customer-id shifts — 10x the users with similar per-user history, the
realistic growth axis for SCD2/sessionize). Row counts and dup
densities therefore scale honestly rather than degenerating into one
giant duplicate cluster.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def make_sf1(out_dir: str, base: str = "/root/testdata/sf0.1") -> str:
    """Write a synthetic sf1 (10x sf0.1) decade of documents /
    embeddings / events into ``out_dir``. Driver-side pyarrow — the
    inputs are ~100 MB; generation is seconds and deterministic."""
    import os
    import random

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)

    docs = pq.read_table(f"{base}/documents.parquet").to_pylist()
    out = []
    for k in range(10):
        for r in docs:
            r2 = dict(r)
            r2["doc_id"] = r["doc_id"] + k * 10_000
            if k:
                words = r["text"].split(" ")
                random.Random(k * 1_000_003 + r["doc_id"]).shuffle(words)
                r2["text"] = " ".join(words)
                r2["n_chars"] = len(r2["text"])
            out.append(r2)
    pq.write_table(pa.Table.from_pylist(out), f"{out_dir}/documents.parquet")

    emb = pq.read_table(f"{base}/embeddings.parquet")
    V = np.asarray([list(v) for v in emb.column("embedding").to_pylist()], dtype=np.float32)
    ids = np.asarray(emb.column("vec_id").to_pylist())
    labels = np.asarray(emb.column("label").to_pylist())
    vs, is_, ls = [V], [ids], [labels]
    for k in range(1, 10):
        rng = np.random.default_rng(k)
        vs.append((0.5 * V + rng.standard_normal(V.shape).astype(np.float32)))
        is_.append(ids + k * 10_000)
        ls.append(labels)
    pq.write_table(
        pa.table(
            {
                "vec_id": np.concatenate(is_),
                "embedding": pa.array([list(map(float, v)) for v in np.concatenate(vs)], pa.list_(pa.float32())),
                "label": pa.array(np.concatenate(ls), pa.int32()),
            }
        ),
        f"{out_dir}/embeddings.parquet",
    )

    orders = pq.read_table(f"{base}/orders.parquet")
    oparts = [orders]
    n_cust = 1 + max(orders.column("o_custkey").to_pylist())
    for k in range(1, 10):
        t = orders.set_column(
            orders.schema.get_field_index("o_orderkey"),
            "o_orderkey",
            pa.array([o + k * 10_000_000 for o in orders.column("o_orderkey").to_pylist()]),
        )
        t = t.set_column(
            t.schema.get_field_index("o_custkey"),
            "o_custkey",
            pa.array([c + k * n_cust for c in orders.column("o_custkey").to_pylist()]),
        )
        oparts.append(t)
    pq.write_table(pa.concat_tables(oparts), f"{out_dir}/orders.parquet")

    # lineitem decade (r13: the snapshot delete sweep row needs it):
    # same order-key shift as orders so the two stay join-consistent
    li = pq.read_table(f"{base}/lineitem.parquet")
    lparts = [li]
    for k in range(1, 10):
        t = li.set_column(
            li.schema.get_field_index("l_orderkey"),
            "l_orderkey",
            pa.array([o + k * 10_000_000 for o in li.column("l_orderkey").to_pylist()]),
        )
        lparts.append(t)
    pq.write_table(pa.concat_tables(lparts), f"{out_dir}/lineitem.parquet")

    ev = pq.read_table(f"{base}/events.parquet")
    parts = [ev]
    n_users = 1 + max(ev.column("user_id").to_pylist())
    for k in range(1, 10):
        t = ev.set_column(
            ev.schema.get_field_index("event_id"),
            "event_id",
            pa.array([e + k * 1_000_000 for e in ev.column("event_id").to_pylist()]),
        )
        t = t.set_column(
            t.schema.get_field_index("user_id"),
            "user_id",
            pa.array([u + k * n_users for u in ev.column("user_id").to_pylist()]),
        )
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/events.parquet")
    return out_dir

# The r7-late additions plus the heaviest established pipeline ops —
# the set whose scaling shape is not already covered by SWEEP.md
# (graph) or KERNEL_BENCH.md (kernels/BSP).
PICKS = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "exact_substring_spans",
    "bm25_rank",
    "semantic_dedup",
    "ann_ivf_pq_topk",
    "ann_ivf_pq_refine",
    "bpe_tokenize",
    "bpe_fertility",
    "pmi_collocations",
    "unimax_mixture",
    "scd2_user_history",
    "streaming_scd2",
    "sessionize_events",
    "funnel_stages",
    "retention_cohorts",
    "rfm_segmentation",
    # r8 debuts
    "bigram_perplexity",
    "ks_drift",
    "embedding_pca",
    # r9 debuts
    "perplexity_buckets",
    "zipf_fit",
    # r10 additions: the other Arrow-kernel dedup line + the media debuts
    "dedup_simhash",
    "multimodal_audio_decode",
    "multimodal_video_frames",
    # r11 additions (r10 verdict task 6): two one-pass r6-block shapes
    # that had never appeared in a sweep column
    "line_dedup_gate",
    "normalize_documents",
    # r11 debuts: GIF codec (decode + animation frames), URL curation,
    # Stupid Backoff trigram LM, native XML parse
    "multimodal_gif_decode",
    "multimodal_gif_frames",
    "url_normalize_stats",
    "stupid_backoff_lm",
    "events_xml_parse",
    "html_extract_text",
    "domain_cap_sample",
    "dedup_image_phash",
    "fixed_width_parse",
    # r12 debuts: boilerplate-removing extraction, versioned snapshots,
    # WARC parsing, robots.txt politeness
    "html_main_content",
    "snapshot_time_travel",
    "warc_parse",
    "robots_filter_stats",
    "html_meta_extract",
    "streaming_snapshot_sink",
    "snapshot_incremental",
    # r13 debuts: splittable .warc.gz (aggregate gate shape), the
    # writer round trip, the CDX selective read, Crawl-delay
    # extraction, and the lakehouse row-level writes
    "warc_gz_parse",
    "warc_gz_roundtrip",
    "warc_cdx_selective",
    "robots_crawl_delay_stats",
    "snapshot_upsert",
    "snapshot_delete_rows",
    "streaming_merge_sink",
    "warc_to_wet",
    "warc_cdx_build",
    "snapshot_zorder_prune",
    # r15 debut: CDF streaming mode on the snapshot source
    "streaming_change_feed",
]


def _warc_gz_records(spark, sf):
    """Sweep-only record-LEVEL .warc.gz read (r12 verdict task 7: the
    gate entries aggregate to 2–5 output rows; this row's output
    scales with the input, so the scan's shape is visible) — also
    prints the task count once per sweep (task 3's 'parallelizes'
    criterion)."""
    import os

    from bigdata_foundation_spark.io import read_warc_gz
    from bigdata_foundation_spark.queries import _warc_gz_fixture

    path = _warc_gz_fixture(spark, sf)
    size = os.path.getsize(path)
    df = read_warc_gz(spark, path, target_split_bytes=max(16 * 1024, -(-size // 8)))
    return df


# Sweep-only callables (not registry entries): record-level variants
# whose OUTPUT row count scales with the input.
EXTRA_PICKS = {
    "warc_gz_records[8-way]": _warc_gz_records,
}


def main() -> int:
    from bigdata_foundation_spark.queries import registry
    from bigdata_foundation_spark.session import get_spark

    spark = get_spark(app_name="pipeline-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    # JVM warmup
    spark.range(1000).selectExpr("sum(id)").collect()

    sfs = list(SFS)
    header = "| query | sf0.001 s (rows) | sf0.01 s (rows) | sf0.1 s (rows) |"
    if "--sf1" in sys.argv:
        import tempfile

        sf1 = make_sf1(tempfile.mkdtemp(prefix="sweep_sf1_"))
        sfs.append(sf1)
        header = header + " sf1 s (rows) |"
    print(header)
    print("| --- | --- | --- |" + (" --- |" if len(sfs) == 3 else " --- | --- |"))
    runnables = [(name, reg[name].fn) for name in PICKS] + list(EXTRA_PICKS.items())
    for name, fn in runnables:
        cells = []
        for sf in sfs:
            t0 = time.perf_counter()
            try:
                n = fn(spark, sf).count()
                dt = time.perf_counter() - t0
                cells.append(f"{dt:.2f} ({n:,})")
            except Exception as exc:  # noqa: BLE001
                cells.append(f"ERR {type(exc).__name__}")
        print(f"| {name} | " + " | ".join(cells) + " |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
