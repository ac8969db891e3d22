"""Measure the graph-analytics family's two execution tiers at 70k
edges (CSV7) and ASSERT tier equivalence row-for-row — the 70k-scale
leg of the kernel-vs-superstep contract (the toy/CSV1 legs live in
tests/test_graph_etl.py).

    python tools/analytics_bench.py [--skip-superstep]

Writes nothing; paste results into KERNEL_BENCH.md. The superstep tier
re-measurement is ~50s of per-superstep scheduling floor — that cost is
the point of the comparison.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bigdata_foundation_spark.session import get_spark


def main() -> int:
    skip_superstep = "--skip-superstep" in sys.argv
    spark = get_spark(app_name="analytics-bench")
    from bigdata_foundation_spark.graph import load_graph
    from bigdata_foundation_spark.graph.etl import (
        _connected_components_superstep,
        connected_components,
        label_propagation,
        pagerank,
    )
    from bigdata_foundation_spark.graph.paths import build_projection

    _nodes, roads = load_graph(spark, "/root/reference/Shenzhen_Edgelist_7.csv")
    proj = build_projection(roads)

    cases = [
        (
            "connected_components",
            lambda: connected_components(roads, strategy="broadcast", projection=proj),
            lambda: _connected_components_superstep(roads),
        ),
        (
            "pagerank (20 iters)",
            lambda: pagerank(spark, roads, strategy="broadcast", projection=proj),
            lambda: pagerank(spark, roads, strategy="bsp"),
        ),
        (
            "label_propagation (10 rounds)",
            lambda: label_propagation(spark, roads, strategy="broadcast", projection=proj),
            lambda: label_propagation(spark, roads, strategy="bsp"),
        ),
    ]
    for name, kern, sstep in cases:
        t0 = time.perf_counter()
        k_rows = sorted(map(tuple, kern().collect()))
        t_k = time.perf_counter() - t0
        if skip_superstep:
            print(f"{name:32s} kernel={t_k:6.2f}s (superstep skipped)")
            continue
        t0 = time.perf_counter()
        s_rows = sorted(map(tuple, sstep().collect()))
        t_s = time.perf_counter() - t0
        assert k_rows == s_rows, f"{name}: tier mismatch ({len(k_rows)} vs {len(s_rows)} rows)"
        print(
            f"{name:32s} kernel={t_k:6.2f}s superstep={t_s:6.2f}s "
            f"speedup={t_s / t_k:6.1f}x rows={len(k_rows):,} EQUAL"
        )

    # round-6 additions: k-core both tiers (h-index loop converges in
    # ~degeneracy-ish rounds — measurable); SCC kernel tier only (the
    # superstep tier's forward coloring is diameter-bound on CSV7 —
    # hundreds of supersteps; its equivalence evidence is the toy +
    # random-digraph pytest and the Kosaraju-replay gate golden).
    from bigdata_foundation_spark.graph.etl import (
        _kcore_superstep,
        core_decomposition,
        strongly_connected_components,
    )

    t0 = time.perf_counter()
    kc = sorted(map(tuple, core_decomposition(spark, roads, strategy="broadcast", projection=proj).collect()))
    t_k = time.perf_counter() - t0
    if not skip_superstep:
        t0 = time.perf_counter()
        ks = sorted(map(tuple, _kcore_superstep(spark, roads).collect()))
        t_s = time.perf_counter() - t0
        assert kc == ks, "kcore tier mismatch"
        print(
            f"{'core_decomposition':32s} kernel={t_k:6.2f}s superstep={t_s:6.2f}s "
            f"speedup={t_s / t_k:6.1f}x rows={len(kc):,} EQUAL"
        )
    else:
        print(f"{'core_decomposition':32s} kernel={t_k:6.2f}s (superstep skipped)")

    t0 = time.perf_counter()
    sc = strongly_connected_components(roads, strategy="broadcast", projection=proj).collect()
    t_k = time.perf_counter() - t0
    n_scc = len({r[1] for r in sc})
    print(
        f"{'strongly_connected_components':32s} kernel={t_k:6.2f}s "
        f"rows={len(sc):,} sccs={n_scc:,} (superstep tier diameter-bound; "
        "equivalence via pytest + Kosaraju golden)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
