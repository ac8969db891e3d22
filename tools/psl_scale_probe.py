"""PSL full-list scale probe (r13 verdict task 7).

The verdict asked to swap the curated PSL snapshot for the full
upstream publicsuffix.org file and record compile-time/size impact.
This sandbox has NO network (``publicsuffix.org`` does not resolve),
so the swap itself is blocked — what CAN be answered offline is the
engineering question behind the ask: do the alternation tiers survive
a full-size rule set?

This probe synthesizes a STRESS list with the real list's shape
(~9k 2-label rules, ~4.5k 3-label, ~600 wildcards, ~10 exceptions —
publicsuffix.org carries ~15k rules), monkeypatches ``_load_psl``,
recompiles the tiers, and measures:

- compile wall (regex assembly) and tier sizes,
- Python ``re`` compile of the biggest alternation,
- Spark-side wall of registered_domain over the sf0.01 documents'
  URL column (the per-row rlike cost through java.util.regex).

The synthetic rules are DISJOINT from the curated snapshot's and use
a reserved fake TLD ('zz'), so every curated-host golden keeps its
value — the probe only adds load.

Usage: python tools/psl_scale_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_rules():
    two = [f"s{i:04d}.zz" for i in range(9000)]
    three = [f"t{i:04d}.s{i % 200:04d}.zz" for i in range(4500)]
    wild = [f"*.w{i:03d}.zz" for i in range(600)]
    exc = [f"!city.w{i:03d}.zz" for i in range(10)]
    return exc, two + three, wild


def main():
    import re

    from bigdata_foundation_spark.operators import web as W

    exc, plain, wild = synth_rules()
    cur_exc, cur_plain, cur_wild = W._load_psl()
    merged = (
        [e[1:] for e in exc] + cur_exc,
        plain + cur_plain,
        [w[2:] for w in wild] + cur_wild,
    )

    W._load_psl, orig_load = (lambda: merged), W._load_psl
    try:
        t0 = time.perf_counter()
        exc_re, exact_re, tiers = W._psl_compile()
        t_compile = time.perf_counter() - t0
        sizes = {k: len(rx) for rx, k in tiers}
        total_chars = sum(len(rx) for rx, _ in tiers) + len(exact_re or "") + len(
            exc_re or ""
        )
        t0 = time.perf_counter()
        for rx, _ in tiers:
            re.compile(rx)
        re.compile(exact_re)
        t_recompile = time.perf_counter() - t0
        print(
            f"rules: {len(merged[1])} plain + {len(merged[2])} wild + "
            f"{len(merged[0])} exc"
        )
        print(f"tier assembly: {t_compile*1000:.1f} ms; tiers (k: regex chars) {sizes}")
        print(f"python re.compile all tiers: {t_recompile*1000:.1f} ms")
        print(f"total regex chars: {total_chars:,}")

        # Spark-side per-row cost through java.util.regex
        from pyspark.sql import functions as F

        from bigdata_foundation_spark.session import get_spark

        # rebuild the module-level compiled tiers under the stress list
        W.PSL_EXCEPTION_RE, W.PSL_EXACT_SUFFIX_RE, W.PSL_TIERS = exc_re, exact_re, tiers
        spark = get_spark(master="local[8]", shuffle_partitions=8)
        from bigdata_foundation_spark.queries import _synth_url

        docs = spark.read.parquet(
            "/root/testdata/sf0.01/documents.parquet"
        ).select(_synth_url("doc_id").alias("url"))
        n = docs.count()
        for label in ("stress", "stress-warm"):
            t0 = time.perf_counter()
            docs.select(W.registered_domain(F.col("url")).alias("d")).groupBy(
                "d"
            ).count().collect()
            print(
                f"registered_domain over {n} urls [{label} list]: "
                f"{time.perf_counter()-t0:.3f} s"
            )
    finally:
        W._load_psl = orig_load
        W.PSL_EXCEPTION_RE, W.PSL_EXACT_SUFFIX_RE, W.PSL_TIERS = W._psl_compile()

    # baseline with the curated list for the same query
    from pyspark.sql import functions as F

    from bigdata_foundation_spark.session import get_spark

    from bigdata_foundation_spark.queries import _synth_url

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).select(_synth_url("doc_id").alias("url"))
    for label in ("curated", "curated-warm"):
        t0 = time.perf_counter()
        docs.select(W.registered_domain(F.col("url")).alias("d")).groupBy(
            "d"
        ).count().collect()
        print(
            f"registered_domain over urls [{label} list]: "
            f"{time.perf_counter()-t0:.3f} s"
        )


if __name__ == "__main__":
    main()
