"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Mirrors the reference's own benchmark design (SURVEY.md §6): its
scale-sweep measures import time + per-algorithm time; here the graph
suite runs on the largest shipped Shenzhen subset (70k rows — the
reference's own CSV7 scale) and the relational / training-data
pipeline suite runs at the requested sf.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GRAPH_CSV = "/root/reference/Shenzhen_Edgelist_7.csv"
GRAPH_SOURCE, GRAPH_TARGET = "2022", "1319"  # farthest pair golden (FIXTURES.md §3.2)

# Headline subset of the registry — the queries a 100 TB deployment
# would actually run hot. The r6-operator block (r6 verdict item 2):
# a perf regression in any round-6 operator was previously invisible
# to the round gate — ExactSubstr, BM25, DSIR, SemDeDup, PQ and the
# new IVF×PQ composition now have headline lines (as do kernel-tier
# SCC/k-core in the graph suite below).
# Round-7 additions: embedding_kmeans (the new first-class curation
# primitive) joins the headline list; MSF/Louvain/node-similarity join
# the 70k graph suite below; the round-7-late debuts with a hot-path
# scan/shuffle shape (IVF×PQ refine, PMI collocations, SCD2 build,
# BPE fertility) get lines so their perf is regression-visible from
# day one.
HEADLINE = [
    "q1_pricing_summary",
    "q3_segment_topk",
    "q5_region_revenue",
    "window_top_orders_per_customer",
    "events_hourly",
    "text_stats",
    "corpus_profile",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_brute_topk",
    "multimodal_decode",
    "asof_join_attribution",
    "pack_sequences_summary",
    "exact_substring_spans",
    "bm25_rank",
    "dsir_scores",
    "semantic_dedup",
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "ann_ivf_pq_refine",
    "embedding_kmeans",
    "bpe_tokenize",
    "quality_classifier",
    "pmi_collocations",
    "scd2_user_history",
    "bpe_fertility",
    "unimax_mixture",
    # Round-8 debuts with a hot-path scan/shuffle shape
    "bigram_perplexity",
    "ks_drift",
    "embedding_pca",
    "perplexity_buckets",
    "zipf_fit",
    # Round-10 debuts: stdlib WAV/PCM decode + uncompressed-AVI frame
    # sampling over synth payloads
    "multimodal_audio_decode",
    "multimodal_video_frames",
    # Round-11 debuts: real GIF decode + animation frame sampling,
    # scan-side URL curation, Stupid Backoff trigram LM
    "multimodal_gif_decode",
    "multimodal_gif_frames",
    "url_normalize_stats",
    "stupid_backoff_lm",
    "html_extract_text",
    "domain_cap_sample",
    "dedup_image_phash",
    "fixed_width_parse",
    # Round-12 debuts: boilerplate-removing main-content extraction,
    # versioned snapshot time travel (batch + streaming sink), WARC
    # parsing, robots.txt politeness, page metadata
    "html_main_content",
    "snapshot_time_travel",
    "warc_parse",
    "robots_filter_stats",
    "html_meta_extract",
    "streaming_snapshot_sink",
    "snapshot_incremental",
    # Round-13 debuts: splittable per-member-gzip WARC ingestion, the
    # distributed writer round trip, and Crawl-delay extraction
    "warc_gz_parse",
    "warc_gz_roundtrip",
    "warc_cdx_selective",
    "robots_crawl_delay_stats",
    # Round-13 debuts: lakehouse row-level writes on the snapshot log
    "snapshot_upsert",
    "snapshot_delete_rows",
    "streaming_merge_sink",
    "warc_to_wet",
    "warc_cdx_build",
    "snapshot_zorder_prune",
    # Round-14 debuts: additive schema evolution, sharded manifests,
    # broadcast suffix-lookup eTLD+1, snapshot streaming source
    "snapshot_schema_evolution",
    "snapshot_sharded_manifest",
    "domain_lookup_stats",
    "streaming_source_tail",
    "snapshot_change_feed",
    "badwords_filter_stats",
    # Round-15 debut: CDF streaming mode on the snapshot source
    "streaming_change_feed",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from bigdata_foundation_spark.queries import registry
    from bigdata_foundation_spark.session import get_spark

    spark = get_spark(app_name="bigdata-foundation-bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    timings: dict[str, float] = {}

    # Warm the JVM / parquet / CSV readers once so the first timed
    # query measures the query, not session startup or reader JIT.
    # The CSV warmup reads a 3-row synthetic file — never the
    # benchmark data itself (the graph ingest stays a cold read of
    # its actual input, like the reference's import).
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as tf:
        tf.write("a,b\n1,x\n2,y\n3,z\n")
        warm_csv = tf.name
    spark.read.option("header", "true").csv(warm_csv).count()
    os.unlink(warm_csv)

    # Machine-speed calibration (reported, not added to the total):
    # two fixed synthetic jobs — pure whole-stage-codegen CPU and a
    # keyed shuffle — whose cost depends only on the host, never on
    # this repo's code. Round-over-round query deltas should be read
    # relative to these (container boots differ measurably: the same
    # commit benched 37s on one boot and 46s on another, with the
    # calibration shifting by the same factor).
    t0 = time.time()
    spark.range(0, 200_000_000, 1, 32).selectExpr("sum(id * 3 + 7)").collect()
    calib_cpu = round(time.time() - t0, 3)
    t0 = time.time()
    (
        spark.range(0, 4_000_000, 1, 32)
        .selectExpr("id % 100000 AS k", "id AS v")
        .groupBy("k")
        .sum("v")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    calib_shuffle = round(time.time() - t0, 3)
    # Third probe (r11 — r10 verdict task 5): PER-JOB FIXED OVERHEAD.
    # The two jobs above measure THROUGHPUT and stayed flat across a
    # round where every sub-second headline line drifted ~1.3× in
    # unison — because a 0.4s line is mostly scheduler/task-launch
    # fixed cost, which neither probe sees. min-of-5 of the cheapest
    # possible action (one task, one row) isolates that fixed cost,
    # so uniform small-line drift becomes mechanically attributable
    # to the host instead of adjudicated by narrative.
    fixed = []
    for _ in range(5):
        t0 = time.time()
        spark.range(1).count()
        fixed.append(time.time() - t0)
    calib_fixed = round(min(fixed), 4)

    def run_once(name: str, fn, clear: bool = False) -> float:
        t0 = time.time()
        df = fn()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        if clear:
            # Operator-internal caches (LSH hash tables etc.) belong to
            # the query just measured; dropping them keeps later
            # timings independent of accumulated memory footprint.
            spark.catalog.clearCache()
        return dt

    def run(name: str, fn, repeats: int = 1, clear: bool = False) -> None:
        best = min(run_once(name, fn, clear) for _ in range(repeats))
        timings[name] = round(best, 3)

    # INTERLEAVED min-of-3 (A,B,…,A,B,… — not A,A,B,B): the first pass
    # pays JIT/codegen warmup for everyone, later passes measure with a
    # warm JIT; interleaving keeps repeat runs far apart so no query's
    # repeat rides its own just-warmed JIT profile unfairly vs the
    # others. Three passes (r5; was two) because this host's run-to-run
    # variance on identical code is ±2× (CPU steal / JIT-queue timing —
    # CALIBRATION.md logs the same swing in the fixed synthetic jobs),
    # and with two samples one bad draw still owns the min. REGIME:
    # every number is COLD-CACHE (clear=True drops operator-internal
    # caches after each run), JIT-warm — each measured pass pays its
    # pipeline's full recompute, shared materializations inside one run
    # count, reuse across runs does not. Speedups must come from the
    # pipeline, not cache residue.
    for pass_i in range(3):
        for name in HEADLINE:
            dt = run_once(name, lambda name=name: reg[name].fn(spark, sf_dir), clear=True)
            timings[name] = round(min(timings.get(name, dt), dt), 3)

    # The graph suite's ingest/projection sharing (below, no clear=) is
    # intentional — it mirrors the reference's amortized projection load.

    # Graph suite: ingest (import benchmark), then the reference's
    # algorithm queries on the 70k-row graph (SURVEY.md §6.4 shape).
    # Ingest + projection are min-of-2 like everything else (r5): both
    # re-execute fully per pass (fresh CSV scan → ETL → collect); only
    # OS/file-system caches persist between passes, which this host's
    # noise floor dwarfs anyway (the same commit measured ingest at
    # 2.5s and 7.7s on one boot).
    from bigdata_foundation_spark.graph import apsp_topk, astar, dijkstra, load_graph, sssp, yens_k
    from bigdata_foundation_spark.graph.paths import build_projection

    proj = None
    for pass_i in range(2):
        if pass_i:
            # load_graph caches nodes/roads; Spark's CacheManager
            # matches the NEXT pass's identical plans against those
            # entries, so without this drop pass 2 would measure a
            # cache lookup, not an ingest.
            spark.catalog.clearCache()
        t0 = time.time()
        nodes, roads = load_graph(spark, GRAPH_CSV)
        n_nodes, n_roads = nodes.count(), roads.count()
        assert (n_nodes, n_roads) == (25341, 69070), (n_nodes, n_roads)  # published goldens
        dt = round(time.time() - t0, 3)
        timings["graph_ingest_70k"] = min(timings.get("graph_ingest_70k", dt), dt)

        t0 = time.time()
        proj = build_projection(roads, nodes)
        dt = round(time.time() - t0, 3)
        timings["graph_projection_70k"] = min(timings.get("graph_projection_70k", dt), dt)

    # Interleaved min-of-2 (same rationale as the headline loop): the
    # second pass measures the amortized-projection steady state (the
    # reference's own regime — GDS loads the projection once per call
    # series) without letting back-to-back repeats ride their own JIT.
    from bigdata_foundation_spark.graph.etl import (
        core_decomposition,
        hyperball,
        louvain,
        minimum_spanning_forest,
        node_similarity,
        strongly_connected_components,
        truss_decomposition,
    )

    graph_queries = [
        ("graph_dijkstra_70k", lambda: dijkstra(spark, roads, GRAPH_SOURCE, GRAPH_TARGET, projection=proj)),
        ("graph_astar_70k", lambda: astar(spark, roads, nodes, GRAPH_SOURCE, GRAPH_TARGET, projection=proj)),
        ("graph_yens_k3_70k", lambda: yens_k(spark, roads, GRAPH_SOURCE, GRAPH_TARGET, k=3, projection=proj)),
        ("graph_sssp_70k", lambda: sssp(spark, roads, GRAPH_SOURCE, projection=proj)),
        ("graph_apsp_top10_70k", lambda: apsp_topk(spark, roads, k=10, projection=proj)),
        # r6-new kernel-tier analytics (r6 verdict item 2)
        ("graph_scc_70k", lambda: strongly_connected_components(roads, projection=proj)),
        ("graph_kcore_70k", lambda: core_decomposition(spark, roads, projection=proj)),
        # r7-new: Boruvka MSF + Louvain (kernel tier), GDS nodeSimilarity
        ("graph_msf_70k", lambda: minimum_spanning_forest(roads, projection=proj)),
        ("graph_louvain_70k", lambda: louvain(roads, projection=proj)),
        ("graph_node_similarity_70k", lambda: node_similarity(roads, k=100)),
        ("graph_hyperball_70k", lambda: hyperball(roads, t_max=8, m=64, projection=proj)),
        ("graph_ktruss_70k", lambda: truss_decomposition(roads, projection=proj)),
    ]
    for pass_i in range(2):
        for name, fn in graph_queries:
            dt = run_once(name, fn)
            timings[name] = round(min(timings.get(name, dt), dt), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "calibration": {
                    "jvm_cpu_sec": calib_cpu,
                    "shuffle_sec": calib_shuffle,
                    "fixed_overhead_sec": calib_fixed,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
