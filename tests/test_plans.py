"""Physical-plan regression tests — the 100 TB design assertions.

A correct answer with a wrong plan (full scan for a 2-column
projection, sort-merge join against a 25-row dim, Python UDF in the
hot path) silently dies at scale; these tests pin the plan shape the
engine is designed around.
"""

import pytest

from bigdata_foundation_spark.queries import registry

from .conftest import SF_SMALL


def plan_of(spark, name: str) -> str:
    df = registry()[name].fn(spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read the join keys it doesn't need
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_q3_broadcasts_dims(spark):
    plan = plan_of(spark, "q3_segment_topk")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k is a heap, not a global sort


def test_q5_broadcasts_dims(spark):
    plan = plan_of(spark, "q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_topk_never_global_sorts(spark):
    plan = plan_of(spark, "orders_topk")
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize(
    "name",
    [
        "text_stats",
        "dedup_exact",
        "ann_brute_topk",
        "events_hourly",
        "exact_substring_spans",
        "bm25_rank",
        "dsir_scores",
        "corpus_drift",
        "url_normalize_stats",
        "stupid_backoff_lm",
    ],
)
def test_no_python_in_hot_path(spark, name):
    """Every text/dedup/similarity operator must stay JVM-side; Python
    (BatchEvalPython / ArrowEvalPython) is allowed only in the
    explicitly-Pandas multimodal decode and the Arrow-vectorized
    fingerprint/ANN kernels (which get their own MapInPandas pins
    below). dedup_simhash and ann_pq_topk moved to the Arrow-kernel
    pin when their arithmetic migrated (r9 ANN, r10 MinHash/SimHash)."""
    plan = plan_of(spark, name)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


@pytest.mark.parametrize("name", ["dedup_simhash", "dedup_minhash_lsh", "ann_pq_topk"])
def test_fingerprint_kernels_use_arrow_not_rowwise(spark, name):
    """The r9/r10 arithmetic migrations run as Arrow-batched
    mapInPandas numpy kernels — never row-at-a-time Python, never a
    cartesian candidate scan."""
    plan = plan_of(spark, name)
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_multimodal_uses_arrow_not_rowwise(spark):
    df = registry()["multimodal_decode"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # Arrow-batched, not row-at-a-time UDF
    assert "BatchEvalPython" not in plan


def test_partial_aggregation_before_shuffle(spark):
    """q1's sums must combine map-side (partial_* functions in the
    pre-shuffle HashAggregate) — at 100 TB the shuffle carries group
    aggregates, not rows."""
    plan = plan_of(spark, "q1_pricing_summary")
    assert "partial_sum" in plan


def test_asof_join_single_shuffle(spark):
    """The as-of join must be ONE hash-partition exchange on the key +
    one window sort — never a range cross-join or a per-row search."""
    plan = plan_of(spark, "asof_join_attribution")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_range_join_is_keyed_not_cartesian(spark):
    """The interval join's equality key must make it a real join (hash
    or sort-merge), never a nested-loop/cartesian scan."""
    plan = plan_of(spark, "range_join_attribution")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or ("ShuffledHashJoin" in plan)


def test_hash_sample_is_pushed_filter(spark):
    """Deterministic sampling must plan as a plain Filter over the scan
    (composable with pushdown), not a Sample or exchange."""
    plan = plan_of(spark, "hash_sample_orders")
    assert "Exchange" not in plan
    assert "Filter" in plan


def test_contamination_broadcasts_eval_grams(spark):
    """The eval-set gram table must broadcast (tiny side), and the
    training corpus must never shuffle its exploded grams for the
    semi-join."""
    plan = plan_of(spark, "contamination_check")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_ngram_counts_partial_agg_topk(spark):
    """Corpus n-gram counting must combine map-side and take the top-k
    with a bounded heap — the difference between shuffling (gram,
    partial-count) pairs and shuffling every gram occurrence."""
    plan = plan_of(spark, "ngram_counts_top")
    assert "TakeOrderedAndProject" in plan
    before_exchange = plan.split("Exchange")[-1]  # deepest = pre-shuffle
    assert "partial_count" in before_exchange or "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gopher_filter_is_scan_side(spark):
    """The quality filter itself is one codegen'd pass: no join, no
    Python, and no shuffle introduced by the filter. The only Exchange
    allowed is _docs' intentional small-file REPARTITION_BY_NUM spread
    (a no-op at production scale where the scan already has splits)."""
    plan = plan_of(spark, "gopher_quality")
    n_exchanges = plan.replace("AQEShuffleRead", "").count("Exchange")
    assert n_exchanges == plan.count("REPARTITION_BY_NUM"), plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tfidf_no_python_bounded_shuffles(spark):
    plan = plan_of(spark, "tfidf_top_terms")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_embedding_neardup_no_cartesian(spark):
    """The embedding near-dup gate must run the LSH-banded candidate
    join — an all-pairs cartesian is correct at sf0.01 and dead at
    100 TB."""
    plan = plan_of(spark, "dedup_embedding_cosine")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_shuffle_rank_no_single_partition_sort(spark):
    """Global shuffle-order ranking must never funnel the corpus
    through one partition: ranking is per-bucket row_number + offset,
    so the plan has no SinglePartition exchange."""
    plan = plan_of(spark, "shuffle_deterministic_order")
    assert "Exchange SinglePartition" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_winnow_overlap_no_cartesian_no_python(spark):
    """Winnow overlap pairs must run as the fingerprint-keyed
    self-join (8-byte shuffle keys), never a cartesian, with every
    expression in codegen — the MOSS-style detector at 100 TB hinges
    on exactly this shape."""
    plan = plan_of(spark, "winnow_overlap_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bucket_pairs_single_shuffle_guard(spark):
    """The LSH candidate generator's oversized-bucket guard must cost
    ZERO extra exchanges: the windowed count and the collect_set
    aggregate share one hash partitioning on (band, key), so the whole
    bucket→pairs stage is exactly two shuffles — the bucket exchange
    and the pair distinct. (The r4 two-pass form spent two more.)"""
    import re

    from pyspark.sql import functions as F

    from bigdata_foundation_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(i, i % 5, i % 3) for i in range(100)], "id long, band int, key long"
    )
    pairs = D._bucket_pairs(df, "id", ["band", "key"], 10)
    pairs.write.format("noop").mode("overwrite").save()
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("Window") == 1, plan


def test_pq_scan_is_broadcast_codes_no_python(spark):
    """PQ-ADC (r6): the only join must be a broadcast nested loop with
    the QUERY side built (the corpus streams once as codes); the plan
    carries no CartesianProduct, no Python eval, and no extra
    Exchange beyond the top-k window's."""
    plan = plan_of(spark, "ann_pq_topk")
    assert "BroadcastNestedLoopJoin" in plan and "BuildLeft" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_perplexity_buckets_one_lang_window_no_python(spark):
    """CCNet bucketing (NEW r9): the split adds exactly ONE
    lang-partitioned window (the ntile) on top of the scorer, with no
    cartesian and no Python eval anywhere — per-language ranking is
    the only added shuffle."""
    plan = plan_of(spark, "perplexity_buckets")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
    lang_windows = [
        ln for ln in plan.splitlines() if "Window" in ln and "lang" in ln
    ]
    assert len(lang_windows) >= 1, plan
    assert "Exchange hashpartitioning(lang" in plan, plan


def test_zipf_fit_takeordered_no_global_sort(spark):
    """Zipf fit (NEW r9): the top-n over the vocabulary must plan as
    TakeOrderedAndProject (per-partition top-n), never a global Sort
    of the token counts; no cartesian, no Python."""
    plan = plan_of(spark, "zipf_fit")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scd2_and_sessionize_single_exchange(spark):
    """SCD2 build and sessionization (r7): the changelog shuffles
    EXACTLY once — one hash-partitioning Exchange on the key serves
    the lag window, the running-sum window, the per-aggregate and (for
    SCD2) the lead window. No Python eval anywhere."""
    for name in ("scd2_user_history", "sessionize_events"):
        plan = plan_of(spark, name)
        assert plan.count("Exchange hashpartitioning") == 1, (name, plan)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_ivf_pq_refine_plan_broadcast_no_python(spark):
    """IVF×PQ refine (r7, encode stage re-pinned r9): the candidate
    fetch must reach the corpus as BROADCAST hash joins (the
    |Q|·shortlist candidate set and the query vectors are the built
    sides — the corpus is never shuffled), with no cartesian and no
    row-at-a-time Python; the encode/probe are Arrow MapInPandas
    stages and the exact re-rank is codegen'd zip_with/aggregate."""
    plan = plan_of(spark, "ann_ivf_pq_refine")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    # r9: encode/probe are Arrow-vectorized MapInPandas stages (numpy
    # batch math); row-at-a-time Python remains banned.
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" in plan, plan
    # the corpus side must not be exchanged for the refine joins:
    # hash-partitioning exchanges may appear only for windows (SinglePartition)
    import re

    assert not re.search(r"Exchange hashpartitioning\((?:neighbor_id|vec_id)", plan), plan


def test_exact_substring_no_cartesian_one_fingerprint_shuffle(spark):
    """ExactSubstr must never cross-join documents, and (r7, verdict
    item 3) the duplicated-gram decision must NOT be a window over
    partitionBy(gram): a corpus-wide boilerplate gram would land every
    occurrence in ONE window partition's external sorter. Pinned shape:
    a two-phase count — partial-combined HashAggregate on the gram key
    (hot gram's reduce input = n_partitions rows) + a LEFT SEMI join of
    the gram table against the duplicated keys (broadcast when small;
    AQE-skew-splittable otherwise). The only Window allowed is the
    island-merge over the DOC id."""
    plan = plan_of(spark, "exact_substring_spans")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # no window partitioned by the gram fingerprint `_g`
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_g#" not in line, line
    # two-phase count: partial + final HashAggregate on the gram key
    assert "partial_count" in plan, plan
    assert "LeftSemi" in plan, plan


def test_ivf_pq_scan_broadcast_literals_no_python(spark):
    """IVF×PQ (r7, re-pinned r9): centroids and codebooks must ride
    WITH the tasks (closure-broadcast into the Arrow encode stage — no
    side table join for the model), the probe join must broadcast the
    small query side, and there must be no cartesian — the registry
    entry's whole pipeline is scan → one Arrow encode stage → one
    broadcast hash join → codegen ADC window."""
    plan = plan_of(spark, "ann_ivf_pq_topk")
    assert "CartesianProduct" not in plan
    # r9: the corpus encode and the query probe/tables are each ONE
    # Arrow MapInPandas stage; row-at-a-time Python remains banned and
    # the ADC sum + ranking stay codegen'd JVM expressions.
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_ivf_pq_query_partition_pruned_no_python(spark, tmp_path):
    """The materialized IVF×PQ index's probe must become parquet
    PARTITION PRUNING on the cell directories (PartitionFilters in the
    scan), with no Python and the codes scan reading only
    (cell, neighbor_id, _codes) — the sublinear-probe ×
    compressed-scan layout the composition exists for."""
    from pyspark.sql import functions as F

    from bigdata_foundation_spark.operators import similarity as S

    e = registry()["ann_ivf_pq_topk"].fn  # noqa: F841 — ensures registration
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    path = str(tmp_path / "ivfpq_plan_idx")
    S.ivf_pq_build(emb, path, n_cells=8)
    qs = emb.filter(F.col("vec_id") < 4)
    df = S.ivf_pq_query(spark, path, qs, k=3, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the queries-side parquet scan reports an empty PartitionFilters;
    # the CODES scan must report the pruning cell filter
    assert any(
        "cell" in seg[:200] for seg in plan.split("PartitionFilters")[1:]
    ), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "ReadSchema" in plan and any(
        "_codes" in seg[:300] for seg in plan.split("ReadSchema")[1:]
    ), plan


def test_dsir_gumbel_topk_bounded_heap(spark):
    """The resampling draw must plan as TakeOrderedAndProject (bounded
    heap) — a global sort of the scored corpus would single-partition
    100 TB of scores."""
    from pyspark.sql import functions as F

    from bigdata_foundation_spark.operators.text import dsir_gumbel_topk

    scores = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 0.1).alias("dsir_logratio")
    )
    plan = dsir_gumbel_topk(scores, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_corpus_drift_sparse_no_vocab_cross_product(spark):
    """corpus_drift's only cross join must be the broadcast 1-row
    global total — the slice × vocabulary product (the naive smoothed
    formulation) must never appear; the token join is keyed."""
    plan = plan_of(spark, "corpus_drift")
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_bloom_probe_scan_side_zero_shuffle(spark):
    """The Bloom probe must be pure scan-side codegen: bitmap as one
    array Literal, k bit tests, NO exchange, NO join, NO Python —
    probing a 100 TB batch costs exactly one pass."""
    from pyspark.sql import functions as F

    from bigdata_foundation_spark.operators.dedup import bloom_build, bloom_probe

    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    words = bloom_build(df.filter(F.col("doc_id") < 50), col="text", n_bits=1 << 10)
    plan = bloom_probe(df, words, col="text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_url_normalize_scan_side_single_agg_exchange(spark):
    """URL normalization + domain extraction must be pure scan-side
    regexp codegen — the only shuffles are the domain aggregate's
    (count-distinct rides the same keyed agg). No joins, no Python."""
    plan = plan_of(spark, "url_normalize_stats")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    # one keyed agg (+ its distinct expand) — never a per-URL join
    assert plan.count("Exchange") <= 3


def test_stupid_backoff_keyed_joins_no_cartesian(spark):
    """Stupid Backoff scoring: count tables join the position table on
    their n-gram keys; the two scalars arrive via ONE broadcast
    nested-loop (1-row build side). Never a cartesian, never Python."""
    plan = plan_of(spark, "stupid_backoff_lm")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_html_extract_scan_side_zero_exchange(spark):
    """HTML -> text is one codegen regexp chain over the scan: no
    shuffle, no join, no Python anywhere in the plan."""
    plan = plan_of(spark, "html_extract_text")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    assert "Exchange" not in plan.replace("AQEShuffleRead", "")


def test_html_main_content_scan_side_zero_exchange(spark):
    """Main-content extraction (r12) is per-row array-op codegen over
    the scan — block split, per-block features, filter, rejoin — with
    no shuffle, no join, no explode, and no Python anywhere."""
    plan = plan_of(spark, "html_main_content")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    assert "Generate" not in plan  # no explode — arrays stay per-row
    assert "Exchange" not in plan.replace("AQEShuffleRead", "")


def test_domain_cap_single_window_shuffle(spark):
    """The per-domain cap is ONE hash-partition exchange on the domain
    + a bounded window — the same shape as any per-group top-k."""
    plan = plan_of(spark, "domain_cap_sample")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_image_phash_arrow_no_cartesian(spark):
    """Image dHash near-dup: decode/hash are Arrow MapInPandas stages;
    candidates come from the pigeonhole bucket join — never a
    cartesian, never row-at-a-time Python."""
    plan = plan_of(spark, "dedup_image_phash")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_fixed_width_scan_side_partial_agg(spark):
    """Fixed-width parsing is substring/trim/cast codegen over the
    scan; the only shuffle belongs to the aggregate, combined
    map-side."""
    plan = plan_of(spark, "fixed_width_parse")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    assert "partial_count" in plan or "partial_min" in plan


def test_warc_parse_scan_side_partial_agg(spark):
    """WARC parsing is scan-side codegen: no Python, no Join; the
    only exchange is the aggregate's."""
    plan = plan_of(spark, "warc_parse")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    # two hash exchanges: the grouped agg + countDistinct's two-phase
    # expand — both keyed, both map-side-combined; parsing itself
    # contributes none
    assert plan.count("Exchange hashpartitioning") <= 2


def test_robots_filter_broadcast_anti_no_url_shuffle(spark):
    """The politeness filter is ONE broadcast left-OUTER equi-join on
    the domain (r13: rules aggregate to one array row per domain;
    match + RFC 9309 precedence run scan-side as higher-order
    functions): the URL side must never hash-exchange and never
    row-multiply (rules broadcast; the only hash exchanges allowed
    are the rule-side window/agg + final agg)."""
    plan = plan_of(spark, "robots_filter_stats")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "LeftOuter" in plan
    assert "SortMergeJoin" not in plan


def test_warc_gz_parse_one_arrow_decode_stage(spark):
    """The splittable .warc.gz read's ONLY Python is the Arrow-batched
    per-range member decode (one mapInPandas); everything above it —
    record parsing, the grouped aggregate, count-distinct — is the
    same codegen shape as warc_parse (no joins, no row-at-a-time
    Python)."""
    plan = plan_of(spark, "warc_gz_parse")
    assert plan.count("MapInPandas") == 1 or plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
    assert "SortMergeJoin" not in plan


def test_warc_cdx_selective_pushdown_and_one_decode_stage(spark):
    """The CDX-indexed selective read: the URI predicate must land as
    a PushedFilter on the _cdx parquet index scan (the archive is
    then touched only at surviving members' byte ranges); the ONLY
    Python is the one mapInPandas member decode; no joins."""
    plan = plan_of(spark, "warc_cdx_selective")
    assert "PushedFilters: [IsNotNull(target_uri)" in plan
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan


def test_warc_to_wet_pure_scan_side(spark):
    """The WARC → WET pipeline (record parse + status/type filter +
    Kohlschütter extraction) must be pure scan-side codegen: no
    Python, no Join, no Exchange at all — deriving WET from a 100 TB
    crawl costs exactly a scan."""
    plan = plan_of(spark, "warc_to_wet")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_schema_evolution_read_single_scan_widened_schema(spark):
    """The post-evolution head read must be ONE parquet scan whose
    ReadSchema is the WIDENED manifest schema over the mixed file set
    (null-fill by name — no mergeSchema footer pass, no per-file
    branching, no union of two scans), plus one keyed agg."""
    plan = plan_of(spark, "snapshot_schema_evolution")
    assert plan.count("Scan parquet") == 1
    assert "cust_ref" in plan.split("ReadSchema")[1][:300]
    assert "Union" not in plan
    assert "BatchEvalPython" not in plan and "Join" not in plan


def test_sharded_manifest_read_plain_scan(spark):
    """Metadata sharding must be invisible to the data plane: the v2
    table's read plan is a plain parquet scan + keyed agg (group-ref
    resolution happened driver-side before Spark planned anything)."""
    plan = plan_of(spark, "snapshot_sharded_manifest")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_domain_lookup_broadcast_only_no_url_shuffle(spark):
    """The suffix-lookup eTLD+1: every rule probe is a BROADCAST hash
    join (map-side — the URL side must NOT shuffle before the final
    aggregate's exchange), and no Python anywhere."""
    plan = plan_of(spark, "domain_lookup_stats")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # exactly the aggregate's two exchanges (partial->final), none
    # below the joins
    agg_part = plan.split("BroadcastHashJoin")[0]
    assert "Exchange" not in agg_part or "hashpartitioning(domain" in agg_part


def test_change_feed_no_cartesian_keyed_diffs(spark):
    """The change feed's per-commit diffs must be keyed joins/EXCEPTs
    over the rewritten files only — no CartesianProduct, no Python."""
    plan = plan_of(spark, "snapshot_change_feed")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
