"""Measure the distance-only SSSP kernels (heap vs numpy delta-stepping)
to justify ``kernel._NUMPY_DIST_EDGE_THRESHOLD``. No Spark involved —
this is the per-task compute that APSP fans out.

    python tools/kernel_bench.py

Writes nothing; paste results into KERNEL_BENCH.md.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bigdata_foundation_spark.graph import kernel as K


def synth(n_nodes: int, deg: int, seed: int, int_weights: bool = False) -> K.Projection:
    rng = np.random.default_rng(seed)
    m = n_nodes * deg
    src = rng.integers(0, n_nodes, m)
    dst = rng.integers(0, n_nodes, m)
    w = rng.integers(1, 1000, m).astype(np.float64) if int_weights else rng.uniform(1.0, 100.0, m)
    ids = np.array([f"n{i}" for i in range(n_nodes)], dtype=object)
    return K.Projection.from_columns(ids[src], ids[dst], w)


def grid(r: int, c: int, seed: int = 7) -> K.Projection:
    """4-neighbour lattice with road-segment-ish weights — the
    high-diameter/low-degree shape a province-scale road network (the
    reference's domain at 100×) actually has. Distinguishes the
    kernels where random synthetics cannot: a degree-4 random graph
    has ~logarithmic diameter, a 500×500 grid has ~1000 hops."""
    rng = np.random.default_rng(seed)
    idx = np.arange(r * c).reshape(r, c)
    srcs, dsts = [], []
    a, b = idx[:, :-1].ravel(), idx[:, 1:].ravel()
    srcs += [a, b]
    dsts += [b, a]
    a, b = idx[:-1, :].ravel(), idx[1:, :].ravel()
    srcs += [a, b]
    dsts += [b, a]
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    w = rng.uniform(50.0, 150.0, len(src))
    ids = np.array([f"n{i}" for i in range(r * c)], dtype=object)
    return K.Projection.from_columns(ids[src], ids[dst], w)


def shenzhen() -> K.Projection | None:
    try:
        import pandas as pd

        df = pd.read_csv("/root/reference/Shenzhen_Edgelist_7.csv").dropna(
            subset=["START_NODE", "END_NODE", "LENGTH"]
        )
        return K.Projection.from_columns(
            df["START_NODE"].astype(str).to_numpy(dtype=object),
            df["END_NODE"].astype(str).to_numpy(dtype=object),
            df["LENGTH"].astype(np.float64).to_numpy(),
        )
    except Exception as e:  # noqa: BLE001
        print(f"(skipping shenzhen: {e})")
        return None


def run(name: str, proj: K.Projection, n_sources: int = 5) -> None:
    proj.hot()  # pre-pay the list-view conversion (per-process cache)
    sources = list(range(0, len(proj.ids), max(1, len(proj.ids) // n_sources)))[:n_sources]

    t0 = time.perf_counter()
    heap_res = []
    for s in sources:
        # call the heap loop directly (bypasses dispatch)
        saved = K._NUMPY_DIST_EDGE_THRESHOLD
        K._NUMPY_DIST_EDGE_THRESHOLD = 1 << 60
        heap_res.append(K._dijkstra_dist(proj, s))
        K._NUMPY_DIST_EDGE_THRESHOLD = saved
    t_heap = (time.perf_counter() - t0) / len(sources)

    t0 = time.perf_counter()
    np_res = [K._delta_dist_numpy(proj, s) for s in sources]
    t_np = (time.perf_counter() - t0) / len(sources)

    for h, d in zip(heap_res, np_res):
        ha = np.array(h)
        assert np.allclose(np.where(np.isinf(ha), -1, ha), np.where(np.isinf(d), -1, d)), name
    print(
        f"{name:28s} edges={proj.n_edges:>9,} heap={t_heap*1e3:9.1f} ms/src "
        f"numpy={t_np*1e3:9.1f} ms/src speedup={t_heap/t_np:6.2f}x"
    )


if __name__ == "__main__":
    sz = shenzhen()
    if sz is not None:
        run("shenzhen_csv7 (69k)", sz, n_sources=8)
    run("grid 500x500 (1M, road)", grid(500, 500), n_sources=3)
    run("grid 800x800 (2.6M, road)", grid(800, 800), n_sources=2)
    run("synth 50k x4 (200k)", synth(50_000, 4, 1), n_sources=6)
    run("synth 125k x8 (1M)", synth(125_000, 8, 2), n_sources=4)
    run("synth 250k x8 (2M)", synth(250_000, 8, 3), n_sources=3)
    run("synth 500k x10 (5M)", synth(500_000, 10, 4), n_sources=2)
    run("synth int weights (1M)", synth(125_000, 8, 5, int_weights=True), n_sources=3)
