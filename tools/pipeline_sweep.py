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
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

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
]


def main() -> int:
    from bigdata_foundation_spark.queries import registry
    from bigdata_foundation_spark.session import get_spark

    spark = get_spark(app_name="pipeline-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    # JVM warmup
    spark.range(1000).selectExpr("sum(id)").collect()

    print("| query | sf0.001 s (rows) | sf0.01 s (rows) | sf0.1 s (rows) |")
    print("| --- | --- | --- | --- |")
    for name in PICKS:
        cells = []
        for sf in SFS:
            t0 = time.perf_counter()
            try:
                n = reg[name].fn(spark, sf).count()
                dt = time.perf_counter() - t0
                cells.append(f"{dt:.2f} ({n:,})")
            except Exception as exc:  # noqa: BLE001
                cells.append(f"ERR {type(exc).__name__}")
        print(f"| {name} | " + " | ".join(cells) + " |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
