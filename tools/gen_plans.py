"""Regenerate PLANS.md: captured physical plans for the queries whose
shape the 100 TB design hangs on. The properties shown are pinned by
tests/test_plans.py; this file is the human-readable evidence.

Usage: python tools/gen_plans.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bigdata_foundation_spark.queries import registry  # noqa: E402
from bigdata_foundation_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

# (query, why-it-matters-at-100TB)
PICKS = [
    ("q1_pricing_summary", "filter pushdown + column pruning + partial aggregation"),
    ("q3_segment_topk", "broadcast joins for dims, TakeOrderedAndProject top-k (no global sort)"),
    ("dedup_exact", "8-byte fingerprint shuffle, not document shuffle"),
    (
        "dedup_embedding_cosine",
        "LSH-banded candidate join — keyed shuffles only, NO CartesianProduct anywhere "
        "in the plan (the all-pairs baseline exists solely as the test oracle)",
    ),
    ("ann_brute_topk", "broadcast query side; one corpus scan; JVM-side dot products"),
    ("asof_join_attribution", "one hash-partition exchange + one window pass — never a range cross-join"),
    (
        "gopher_quality",
        "one codegen'd scan pass; the only Exchange is the intentional small-file "
        "REPARTITION_BY_NUM spread (a no-op at production scale)",
    ),
    (
        "ngram_counts_top",
        "map-side partial_count before the gram shuffle + bounded-heap top-k",
    ),
    (
        "winnow_overlap_pairs",
        "fingerprint-keyed self-join on 8-byte hashes (doc-freq capped) — "
        "no cartesian, no Python; text never shuffles",
    ),
    (
        "corpus_profile",
        "the per-slice data card: ONE codegen'd scan pass into ONE hash "
        "aggregate (count-distinct compiles to an Expand, not a second scan)",
    ),
    (
        "exact_substring_spans",
        "ExactSubstr: the gram table shuffles 8-byte xxhash64 fingerprints "
        "(ONE window-count exchange decides duplication — no agg+join, which "
        "would shuffle twice), islands shuffle only the doc id; token text "
        "never leaves its document row and there is no join in the plan",
    ),
    (
        "dsir_scores",
        "DSIR: two count aggregates train both unigram LMs map-side; the "
        "merged feature table is the only join side (collapses to <= B "
        "broadcastable rows with hash_buckets) and the N/V scalars "
        "broadcast — one explode pass over the corpus, keyed shuffles only",
    ),
    (
        "graph_triangles",
        "wedge join + closure semi-join on node keys — the triangle count "
        "never materializes a cartesian or collects edges to the driver",
    ),
    (
        "ann_pq_topk",
        "PQ-ADC scan (r9): encode and per-query tables are ONE Arrow "
        "MapInPandas stage each (numpy batch math — never row-at-a-time "
        "Python); the only join is a BroadcastNestedLoop of (tiny query "
        "tables) × (corpus CODES — m ints per row, 32× narrower than the "
        "raw vectors) and the ADC sum + ranking stay codegen'd",
    ),
    (
        "ann_ivf_pq_refine",
        "the refine tail fetches candidate vectors through BROADCAST hash "
        "joins (the |Q|·shortlist candidate set and query vectors are the "
        "built sides) — the corpus is scanned, never shuffled; encode/probe "
        "are Arrow MapInPandas stages (r9) and the exact re-rank is "
        "codegen'd zip_with/aggregate",
    ),
    (
        "pmi_collocations",
        "two map-side-combined count aggregates over 8-byte-ish gram keys, "
        "broadcast 1-row totals, and a TakeOrderedAndProject top-k — the "
        "corpus text never crosses the wire",
    ),
    (
        "scd2_user_history",
        "ONE Exchange on the key serves the lag window, the running-sum "
        "window, the per-version aggregate AND the lead window — the "
        "changelog shuffles exactly once",
    ),
    (
        "bloom_dedup_probe",
        "the Bloom probe half is pure scan-side codegen: the bitmap rides "
        "the plan as ONE array Literal and the k bit tests are "
        "element_at+bitwiseAND expressions — probing a new batch against "
        "billions of stored fingerprints costs one pass, zero Exchange, "
        "zero joins (the build half's only shuffle carries <= n_bits/64 "
        "partially-OR'd words)",
    ),
    (
        "corpus_drift",
        "JS divergence without smoothing stays SPARSE: the only wide state "
        "is the global token-count table, joined KEYED on token — never the "
        "slice x vocabulary cross product the smoothed formulation forces; "
        "absent-token mass is a closed-form telescoped scalar",
    ),
    (
        "bigram_perplexity",
        "bigrams built SCAN-SIDE (arrays_zip of the token array against its "
        "tail — no per-doc window shuffle); LM counts are map-side-combined "
        "aggs; scoring is keyed joins + one per-doc avg — text shuffles once",
    ),
    (
        "embedding_pca",
        "train-on-sample / project-at-scan: the projection is pure "
        "zip_with/aggregate folds against folded literal loadings — zero "
        "Exchange, zero Python on data; training cost is ONE TakeOrdered "
        "sample pass at any corpus size",
    ),
    (
        "perplexity_buckets",
        "CCNet bucketing (r9; exact mode): the scorer's LM aggregate + keyed "
        "score joins, then exactly ONE lang-keyed Exchange for the ntile "
        "window — per-language ranking is the only added shuffle. Language "
        "is the canonical SKEWED key, so the corpus-scale mode is "
        "exact=False (r10): per-language percentile_approx boundaries in "
        "one map-side-combined aggregate, assigned scan-side via a "
        "broadcast join + CASE — no Window, no per-language Sort (pinned by "
        "test_perplexity_buckets_approx_matches_exact_off_boundaries)",
    ),
    (
        "dedup_minhash_lsh",
        "MinHash-LSH (r10 Arrow kernel): shingling, the 64-seed signature "
        "minima, band keys AND the verify hash sets fuse into ONE "
        "MapInPandas pass — the shingle explode and its 64-min aggregate "
        "Exchange are GONE; the remaining shuffles are the band bucket "
        "window/agg and the candidate joins, all keyed; no Python "
        "row-at-a-time, no cartesian",
    ),
    (
        "dedup_simhash",
        "SimHash (r10 Arrow kernel): tokenize+hash+bit-vote per document in "
        "ONE MapInPandas pass — the token explode and the 60-column vote "
        "aggregate are gone; fingerprints are computed where the text is "
        "scanned (zero shuffle before the pigeonhole bucket join)",
    ),
    (
        "multimodal_video_frames",
        "uncompressed-AVI decode + frame sampling (NEW r10): synth + "
        "decode/sample are chained MapInPandas stages over the id scan — "
        "partitioning preserved, zero shuffle; one row per sampled frame "
        "with REAL pixel features",
    ),
    (
        "multimodal_audio_decode",
        "WAV/PCM decode (NEW r10): synth + decode are TWO chained "
        "MapInPandas stages over the id scan — partitioning preserved, no "
        "shuffle anywhere; per-file codec work is exactly the "
        "embarrassingly-parallel shape a 100 TB media ingest needs",
    ),
    (
        "zipf_fit",
        "Zipf fit (NEW r9): one map-side-combined token-count agg, a "
        "TakeOrderedAndProject top-n (never a global vocabulary sort), and "
        "a 5-scalar OLS aggregate — corpus volume dies at the first agg",
    ),
    (
        "ks_drift",
        "exact two-sample KS per slice from ONE (group, value) count agg; "
        "the only wide state is the |values| x |slices| window grid (slices "
        "few by construction) — one cumsum Exchange, never a row-level "
        "cross product",
    ),
    (
        "url_normalize_stats",
        "URL curation (NEW r11): normalization + registered-domain "
        "extraction are pure scan-side regexp codegen — no join, no "
        "Python; the only shuffles belong to the per-domain aggregate "
        "(count-distinct Expand rides the same keyed agg)",
    ),
    (
        "html_extract_text",
        "HTML -> text (NEW r11): ONE codegen regexp chain over the scan "
        "- zero Exchange, zero Python, zero joins; extracting 100 TB of "
        "crawl HTML costs exactly a scan",
    ),
    (
        "stupid_backoff_lm",
        "Stupid Backoff trigram LM (NEW r11): three map-side count "
        "aggregates train the LM on the reference slice; scoring is one "
        "scan-side trigram explode + five LEFT keyed joins + a per-doc "
        "avg — the two scalars ride ONE broadcast nested-loop (1-row "
        "build side), never a cartesian",
    ),
    (
        "html_main_content",
        "boilerplate-removing main-content extraction (NEW r12): the "
        "Kohlschütter block classifier is per-row ARRAY codegen "
        "(split -> transform -> filter -> array_join) — zero Exchange, "
        "zero Generate (no explode), zero Python, zero joins; "
        "de-boilerplating 100 TB of crawl HTML costs exactly a scan",
    ),
    (
        "warc_parse",
        "WARC record parsing (NEW r12): WARC + HTTP header extraction "
        "is pure scan-side regexp codegen — no join, no Python; the "
        "only exchanges are the aggregate's (keyed + count-distinct "
        "Expand), so parsing a 100 TB crawl archive costs a scan",
    ),
    (
        "robots_filter_stats",
        "robots.txt politeness filter (r12; r13 = RFC 9309 wildcards + "
        "Allow precedence): rule extraction is one line explode + ONE "
        "domain-keyed window; rules aggregate to ONE broadcast array "
        "row per domain, so filtering is ONE broadcast LeftOuter "
        "equi-join whose match + longest-rule/allow-wins precedence "
        "run scan-side as higher-order functions — the URL side of "
        "the crawl never shuffles and never row-multiplies",
    ),
    (
        "warc_gz_parse",
        "splittable .warc.gz ingestion (NEW r13): split planning is "
        "driver-side metadata (os.stat); the only Python is the "
        "Arrow-batched per-range gzip-member decode (ONE "
        "ArrowEvalPython/mapInPandas over ~8 byte ranges — the "
        "member-aware work Spark's whole-file gzip fallback cannot "
        "split); parsing + aggregate above it are the same codegen "
        "shapes as warc_parse",
    ),
    (
        "warc_cdx_selective",
        "CDX-indexed selective member read (NEW r13): the URI "
        "predicate lands as PushedFilters on the (tiny) _cdx parquet "
        "index scan — the archive itself is touched only at the "
        "surviving members' exact (offset, length) ranges via ONE "
        "mapInPandas over range-partitioned, offset-sorted index "
        "rows (forward-only seeks = ranged GETs); no "
        "re-synchronization scan, no bytes read for excluded members",
    ),
    (
        "snapshot_upsert",
        "snapshot MERGE/upsert (NEW r13): the write side is "
        "file-granular copy-on-write — footer-stats key ranges bound "
        "the candidate files, ONE semi-join (AQE-planned: small update "
        "sets auto-broadcast) finds the files actually holding matched "
        "keys, only those rewrite; the captured plan is the post-merge "
        "READ — a plain manifest-listed parquet scan + keyed agg, "
        "because merged state is just files (no merge-on-read debt, "
        "no log replay at query time)",
    ),
    (
        "snapshot_zorder_prune",
        "OPTIMIZE ZORDER + 2-D manifest prune (NEW r13): the zorder "
        "rewrite is one range exchange + in-partition sort at COMMIT "
        "time; the captured READ plan shows the payoff — a "
        "manifest-listed parquet scan over only the prune-surviving "
        "files + the row filter + one keyed agg; skipping happened "
        "before Spark opened anything",
    ),
    (
        "snapshot_schema_evolution",
        "additive schema evolution (NEW r14): the captured READ is the "
        "post-evolution head — ONE parquet scan whose ReadSchema is the "
        "WIDENED manifest schema over a MIXED file set (pre-evolution "
        "files null-fill the added column by name, no mergeSchema "
        "footer pass, no per-file branching) + one keyed agg; evolving "
        "a 100 TB table rewrites nothing",
    ),
    (
        "snapshot_sharded_manifest",
        "sharded manifest v2 (NEW r14): the captured READ follows "
        "overwrite -> merge -> prune-bounded delete, all committed as "
        "group-ref manifests — the plan is still a plain "
        "manifest-listed parquet scan + keyed agg, because metadata "
        "sharding is invisible to the data plane: group bounds decided "
        "which blobs were even opened before Spark planned anything",
    ),
    (
        "warc_to_wet",
        "WARC -> WET end-to-end (NEW r13): record parsing, the "
        "200+text/html filter, and the Kohlschuetter main-content "
        "classifier compose into ONE codegen Project over the scan — "
        "no Python, no Join, ZERO Exchange; deriving WET sidecars "
        "from a 100 TB crawl costs exactly the scan",
    ),
]


def main() -> None:
    spark = get_spark(app_name="gen-plans", master="local[8]")
    reg = registry()
    out = [
        "# PLANS — captured physical plans (evidence for the scale design)",
        "",
        "GENERATED by tools/gen_plans.py from `.explain('formatted')` at",
        "sf0.01; the properties shown here are pinned by tests/test_plans.py.",
        "",
    ]
    for name, why in PICKS:
        df = reg[name].fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"## {name}")
        out.append("")
        out.append(f"*Why it matters at 100 TB: {why}.*")
        out.append("")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```")
        out.append("")
        print(f"captured {name}")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
