"""r9 A/B for the BSP kernel restructure (advisor finding + r8 verdict
tasks 3/4): supported broadcast shapes (two-join EXISTS decomposition),
per-THIS-step candidate gating, settled-base + pending-frontier
improvement test.

Arms:
  1. bsp_multi_sssp 64-source wave, 1M-edge synth:
       shuffle-only (broadcast_frontier_rows=0)  vs
       adaptive     (broadcast_frontier_rows=65_536, candidate-gated)
     — distances must be bit-exact across arms.
  2. bsp_sssp 520x520 grid, dist-only, src-bucketed edges (r8 baseline
     698s / 672 ms-superstep) — verified vs the numpy kernel.

    python tools/bsp_ab_r9.py [--multi-only|--grid-only]

Paste results into KERNEL_BENCH.md.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bsp_bench import grid_pdf, synth_pdf  # noqa: E402

from bigdata_foundation_spark.session import get_spark  # noqa: E402


def main() -> int:
    spark = get_spark(app_name="bsp-ab-r9")
    spark.sparkContext.setLogLevel("ERROR")
    from bigdata_foundation_spark.graph import bsp as B
    from bigdata_foundation_spark.graph import kernel as K
    from bigdata_foundation_spark.io import write_bucketed

    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="bsp_ab_")
    try:
        if not any(f in sys.argv for f in ("--grid-only", "--prune-grid")):
            n_nodes, deg = 125_000, 8
            pdf = synth_pdf(n_nodes, deg, 42)
            spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{tmp}/edges")
            roads = spark.read.parquet(f"{tmp}/edges")
            m = roads.count()
            wave = [f"n{i}" for i in range(0, n_nodes, max(1, n_nodes // 64))][:64]
            print(f"multi-sssp arm: {n_nodes:,} nodes, {m:,} edges, {len(wave)} sources")

            results = {}
            for label, thr in (("shuffle-only", 0), ("adaptive", 65_536)):
                stats: dict = {}
                t0 = time.perf_counter()
                st = B.bsp_multi_sssp(
                    spark, roads, wave, stats=stats, broadcast_frontier_rows=thr
                )
                rows = {
                    (r["source"], r["node"]): r["dist"]
                    for r in st.select("source", "node", "dist").collect()
                }
                dt = time.perf_counter() - t0
                results[label] = rows
                print(
                    f"bsp_multi_sssp 64src {label:13s} {dt:7.1f}s  "
                    f"supersteps={stats['supersteps']:3d}  rows={len(rows):,}"
                )
            a, b = results["shuffle-only"], results["adaptive"]
            assert a.keys() == b.keys(), (len(a), len(b))
            worst = max(abs(a[k] - b[k]) for k in a)
            print(f"multi arms bit-exact: max |delta| = {worst:.1e}")
            assert worst == 0.0, worst

        if "--prune-grid" in sys.argv:
            r = c = 520
            gpdf = grid_pdf(r, c)
            spark.createDataFrame(gpdf).write.mode("overwrite").parquet(f"{tmp}/gp")
            groads = spark.read.parquet(f"{tmp}/gp")
            write_bucketed(groads, "bsp_ab_prune_bucketed", ["src"], n_buckets=32)
            try:
                broads = spark.table("bsp_ab_prune_bucketed")
                gproj = K.Projection.from_columns(
                    gpdf["src"].to_numpy(dtype=object),
                    gpdf["dst"].to_numpy(dtype=object),
                    gpdf["cost"].to_numpy(dtype=np.float64),
                )
                goracle = K.sssp(gproj, "n0")
                stats_p: dict = {}
                t0 = time.perf_counter()
                pstate = B.bsp_sssp(
                    spark, broads, "n0", stats=stats_p, carry_paths=False,
                    prune_edge_probe=4096,
                )
                pgot = {
                    row["node"]: row["dist"]
                    for row in pstate.select("node", "dist").collect()
                }
                t_p = time.perf_counter() - t0
                pworst = max(abs(pgot[k] - goracle[k]) for k in goracle)
                assert pworst < 1e-9, pworst
                print(
                    f"bsp_sssp grid {r}x{c} BUCKETED dist-only PRUNED-PROBE {t_p:7.1f}s  "
                    f"supersteps={stats_p['supersteps']:4d}  "
                    f"({1000 * t_p / stats_p['supersteps']:.0f} ms/superstep; "
                    f"VERIFIED vs kernel, max |delta| {pworst:.1e})"
                )
            finally:
                spark.sql("DROP TABLE IF EXISTS bsp_ab_prune_bucketed")
            return 0

        if "--multi-only" not in sys.argv:
            r = c = 520
            gpdf = grid_pdf(r, c)
            spark.createDataFrame(gpdf).write.mode("overwrite").parquet(f"{tmp}/gbig")
            groads = spark.read.parquet(f"{tmp}/gbig")
            gm = groads.count()
            write_bucketed(groads, "bsp_ab_gbig_bucketed", ["src"], n_buckets=32)
            try:
                broads = spark.table("bsp_ab_gbig_bucketed")
                gproj = K.Projection.from_columns(
                    gpdf["src"].to_numpy(dtype=object),
                    gpdf["dst"].to_numpy(dtype=object),
                    gpdf["cost"].to_numpy(dtype=np.float64),
                )
                goracle = K.sssp(gproj, "n0")
                stats_l: dict = {}
                t0 = time.perf_counter()
                lstate = B.bsp_sssp(
                    spark, broads, "n0", stats=stats_l, carry_paths=False
                )
                lgot = {
                    row["node"]: row["dist"]
                    for row in lstate.select("node", "dist").collect()
                }
                t_lean = time.perf_counter() - t0
                lworst = max(abs(lgot[k] - goracle[k]) for k in goracle)
                assert lworst < 1e-9, lworst
                print(
                    f"bsp_sssp grid {r}x{c} BUCKETED dist-only {t_lean:7.1f}s  "
                    f"supersteps={stats_l['supersteps']:4d}  "
                    f"({1000 * t_lean / stats_l['supersteps']:.0f} ms/superstep; "
                    f"VERIFIED vs kernel, max |delta| {lworst:.1e})"
                )
            finally:
                spark.sql("DROP TABLE IF EXISTS bsp_ab_gbig_bucketed")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
