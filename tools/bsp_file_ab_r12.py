"""r12 A/B (verdict task 4): multi-source past broadcast scale —
file-spilled mmap CSR kernel tier vs the wave-batched BSP superstep
tier, on the r9 reference shape (125k-node / 1M-edge degree-8
expander, 64 sources).

Arm 1: bsp_multi_sssp shuffle-only (the r9 winner inside the BSP
tier; 243 s on the r9 host).
Arm 2: the same 64 full SSSPs over kernel.load_spilled_projection —
each task mmap-loads the CSR spilled once by the driver (per-HOST
page-cache sharing instead of per-process broadcast pickles) and runs
the numpy delta-stepping kernel per source.

Distances must be bit-exact across arms. Also times apsp_topk
strategy='file' end-to-end on the same graph (the user-facing G3
surface of the tier).

    python tools/bsp_file_ab_r12.py [--skip-bsp]

Paste results into KERNEL_BENCH.md §r12.
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bsp_bench import synth_pdf  # noqa: E402

from bigdata_foundation_spark.session import get_spark  # noqa: E402


def main() -> int:
    spark = get_spark(app_name="bsp-file-ab-r12")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    from bigdata_foundation_spark.graph import bsp as B
    from bigdata_foundation_spark.graph import kernel as K
    from bigdata_foundation_spark.graph import paths as P

    tmp = tempfile.mkdtemp(prefix="bsp_file_ab_")
    n_nodes, deg = 125_000, 8
    pdf = synth_pdf(n_nodes, deg, 42)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{tmp}/edges")
    roads = spark.read.parquet(f"{tmp}/edges")
    m = roads.count()
    wave = [f"n{i}" for i in range(0, n_nodes, max(1, n_nodes // 64))][:64]
    print(f"graph: {n_nodes:,} nodes, {m:,} edges, {len(wave)} sources", flush=True)

    # ---- arm 2: file-spilled kernel tier --------------------------------
    t0 = time.perf_counter()
    proj = P.build_projection(roads)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    spill = K.spill_projection(proj, f"{tmp}/spill")
    t_spill = time.perf_counter() - t0

    idx = proj.index
    pairs = [(s, idx[s]) for s in wave]

    def _task(it):
        b = list(it)
        if not b:
            return iter(())
        p = K.load_spilled_projection(spill)
        out = []
        for s, i in b:
            dist = K._delta_dist_numpy(p, i)
            import numpy as np

            finite = np.flatnonzero(np.isfinite(dist))
            out.extend((s, str(p.ids[j]), float(dist[j])) for j in finite)
        return iter(out)

    t0 = time.perf_counter()
    rows_file = dict()
    for s, nde, d in sc.parallelize(pairs, len(pairs)).mapPartitions(_task).collect():
        rows_file[(s, nde)] = d
    t_file = time.perf_counter() - t0
    print(
        f"file-kernel arm: build {t_build:.1f}s + spill {t_spill:.1f}s + "
        f"64-source waves {t_file:.1f}s = {t_build + t_spill + t_file:.1f}s "
        f"({len(rows_file):,} finite rows)",
        flush=True,
    )

    # ---- arm 1: BSP superstep tier --------------------------------------
    if "--skip-bsp" not in sys.argv:
        stats: dict = {}
        t0 = time.perf_counter()
        st = B.bsp_multi_sssp(spark, roads, wave, stats=stats, broadcast_frontier_rows=0)
        rows_bsp = {
            (r["source"], r["node"]): r["dist"]
            for r in st.select("source", "node", "dist").collect()
        }
        t_bsp = time.perf_counter() - t0
        print(
            f"bsp superstep arm: {t_bsp:.1f}s  supersteps={stats['supersteps']}  "
            f"rows={len(rows_bsp):,}",
            flush=True,
        )
        assert rows_bsp.keys() == rows_file.keys(), (len(rows_bsp), len(rows_file))
        worst = max(abs(rows_bsp[k] - rows_file[k]) for k in rows_bsp)
        print(f"arms bit-exact: max |delta| = {worst:.1e}")
        assert worst == 0.0, worst
        print(
            f"\nratio file/bsp = {(t_build + t_spill + t_file) / t_bsp:.4f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
