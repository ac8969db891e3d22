"""r10 A/B for the frontier-pruned edge probe's CLAIMED regime
(r9 verdict task: "measure the beyond-cache regime or retire the
knob").

r9 measured the pruned probe 3.2x SLOWER when the edge projection is
cache-RESIDENT (521 -> 1688 s on the 520x520 grid) and defaulted it
OFF, with the claim that its regime is edge tables too big to hold in
memory. This harness measures that regime honestly at test scale:

  topology = a small lattice (the SSSP wave's search region, ~120
  supersteps) embedded in a LARGE disconnected decoy edge mass — the
  continental-road-network shape where one query's wavefront touches a
  metro area while the edge table is the whole continent.

  Arm FULL  : default probe, edge projection persisted DISK_ONLY —
              exactly what MEMORY_AND_DISK degrades to past memory
              scale: every superstep's frontier⋈edges join
              deserializes the WHOLE |E| from disk blocks.
  Arm PRUNED: prune_edge_probe engaged — per superstep a literal
              src IN (frontier) scan of the original parquet (sorted
              by src, so row-group min/max stats prune the decoy
              mass), cost tracking |frontier| not |E|.

Distances must be bit-equal across arms; reachable set = the lattice.

    python tools/bsp_prune_ab_r10.py [--grid R] [--decoys N]

Paste results into KERNEL_BENCH.md.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

from bsp_bench import grid_pdf  # noqa: E402

from bigdata_foundation_spark.session import get_spark  # noqa: E402


def decoy_pdf(n_edges: int, seed: int = 11) -> pd.DataFrame:
    """Disconnected decoy edge mass on d* nodes — inflates |E| without
    touching the lattice component the wave explores."""
    rng = np.random.default_rng(seed)
    n_nodes = max(n_edges // 8, 1)
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    return pd.DataFrame(
        {
            "src": np.char.add("d", src.astype(str)),
            "dst": np.char.add("d", dst.astype(str)),
            "cost": rng.uniform(50.0, 150.0, n_edges),
            "road_id": np.char.add("x", np.arange(n_edges).astype(str)),
        }
    )


def main() -> int:
    import shutil
    import tempfile

    grid = 60
    decoys = 5_000_000
    for i, a in enumerate(sys.argv):
        if a == "--grid":
            grid = int(sys.argv[i + 1])
        if a == "--decoys":
            decoys = int(sys.argv[i + 1])

    spark = get_spark(app_name="bsp-prune-ab-r10")
    spark.sparkContext.setLogLevel("ERROR")
    from bigdata_foundation_spark.graph import bsp as B

    tmp = tempfile.mkdtemp(prefix="prune_ab_")
    try:
        g = grid_pdf(grid, grid)
        d = decoy_pdf(decoys)
        pdf = pd.concat([g, d], ignore_index=True)
        # sorted by src -> parquet row-group min/max stats separate the
        # d* decoy mass from the n* lattice, so the pruned arm's
        # IN-filter scan skips decoy row groups entirely
        (
            spark.createDataFrame(pdf)
            .repartition(32)
            .sortWithinPartitions("src")
            .write.mode("overwrite")
            .parquet(f"{tmp}/edges")
        )
        roads = spark.read.parquet(f"{tmp}/edges")
        m = roads.count()
        print(f"edge table: {m:,} rows ({len(g):,} lattice + {len(d):,} decoy), grid {grid}x{grid}")

        results = {}
        for label, kw in (
            ("full/DISK_ONLY", dict(edge_storage_level="DISK_ONLY")),
            (
                "pruned/DISK_ONLY",
                dict(edge_storage_level="DISK_ONLY", prune_edge_probe=1_000_000),
            ),
        ):
            stats: dict = {}
            t0 = time.perf_counter()
            st = B.bsp_sssp(
                spark, roads, "n0", carry_paths=False, stats=stats, **kw
            )
            rows = {r["node"]: r["dist"] for r in st.collect()}
            dt = time.perf_counter() - t0
            results[label] = (dt, rows, stats.get("supersteps"))
            print(
                f"  {label:18s}: {dt:7.1f}s  reachable={len(rows):,}  "
                f"supersteps={stats.get('supersteps')}"
            )
            spark.catalog.clearCache()

        (t_full, r_full, _), (t_pruned, r_pruned, _) = (
            results["full/DISK_ONLY"],
            results["pruned/DISK_ONLY"],
        )
        assert r_full == r_pruned, "ARMS DIVERGE — pruned probe broken"
        assert len(r_full) == grid * grid, (len(r_full), grid * grid)
        print(
            f"bit-equal distances over {len(r_full):,} nodes; "
            f"pruned/full = {t_pruned / t_full:.2f}x "
            f"({'PRUNED WINS' if t_pruned < t_full else 'FULL WINS'})"
        )
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
