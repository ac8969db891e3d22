"""Config A/B probe (r15 optimization round, guide §1/§9).

Times a join/shuffle/Python-boundary-heavy subset of the bench under
one runtime config override, in bench.py's exact regime (interleaved
min-of-N, noop sink, clearCache between runs). Baseline = no override.

Usage: python tools/conf_ab_r15.py [key value] [passes]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bigdata_foundation_spark.queries import registry  # noqa: E402
from bigdata_foundation_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
SUBSET = [
    "q1_pricing_summary",
    "q3_segment_topk",
    "q5_region_revenue",
    "window_top_orders_per_customer",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "semantic_dedup",
    "multimodal_decode",
    "dedup_image_phash",
    "bigram_perplexity",
    "stupid_backoff_lm",
    "pmi_collocations",
    "exact_substring_spans",
    "bm25_rank",
    "ks_drift",
    "embedding_kmeans",
]


def main() -> None:
    key = sys.argv[1] if len(sys.argv) > 2 else None
    val = sys.argv[2] if len(sys.argv) > 2 else None
    passes = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 3
    spark = get_spark(app_name="conf-ab-r15")
    spark.sparkContext.setLogLevel("ERROR")
    if key:
        spark.conf.set(key, val)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF}/region.parquet").count()
    t0 = time.time()
    spark.range(0, 200_000_000, 1, 32).selectExpr("sum(id * 3 + 7)").collect()
    calib = round(time.time() - t0, 3)
    reg = registry()
    timings: dict[str, float] = {}
    for _ in range(passes):
        for name in SUBSET:
            t0 = time.time()
            reg[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            spark.catalog.clearCache()
            timings[name] = round(min(timings.get(name, dt), dt), 3)
    print(json.dumps({"conf": {key: val} if key else {}, "calib_cpu": calib,
                      "total": round(sum(timings.values()), 3), "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
