"""Path-algorithm correctness.

Oracles, mirroring the reference's own verification practices
(SURVEY.md §5): (1) FIXTURES.md §3.2 goldens computed by an independent
survey-time Dijkstra; (2) an in-test Bellman–Ford oracle written
independently of the engine's heap kernel; (3) cross-algorithm
agreement (delta-stepping == Dijkstra, MAIN:388; Yen path #0 ==
Dijkstra, MAIN:703); (4) broadcast-strategy == BSP-strategy.
"""

import math

import pytest
from pyspark.sql import functions as F

from bigdata_foundation_spark.graph import apsp_topk, astar, dijkstra, sssp, yens_k
from bigdata_foundation_spark.graph.paths import build_projection, path_summary

SOURCE = "2022"
# FIXTURES.md §3.2, file _1: reachable nodes, farthest node, distance, path len
REACHABLE_1, FARTHEST_1, FARTHEST_DIST_1, FARTHEST_HOPS_1 = 2191, "2802", 9221.720431, 66


def bellman_ford_oracle(edges, source):
    """Deliberately different algorithm from the engine kernel."""
    dist = {source: 0.0}
    changed = True
    while changed:
        changed = False
        for s, d, c in edges:
            if s in dist and dist[s] + c < dist.get(d, math.inf) - 1e-12:
                dist[d] = dist[s] + c
                changed = True
    return dist


@pytest.fixture(scope="module")
def proj(graph1):
    nodes, roads = graph1
    return build_projection(roads, nodes)


@pytest.fixture(scope="module")
def edge_rows(graph1):
    _nodes, roads = graph1
    return [(r[0], r[1], float(r[2])) for r in roads.select("src", "dst", "cost").collect()]


def test_sssp_matches_independent_oracle(spark, graph1, proj, edge_rows):
    _nodes, roads = graph1
    got = {r[0]: r[1] for r in sssp(spark, roads, SOURCE, projection=proj).collect()}
    want = bellman_ford_oracle(edge_rows, SOURCE)
    assert len(got) == len(want) == REACHABLE_1
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_sssp_fixture_goldens(spark, graph1, proj):
    _nodes, roads = graph1
    res = sssp(spark, roads, SOURCE, projection=proj)
    far = res.orderBy(F.desc("distance")).first()
    assert far["NodeId"] == FARTHEST_1
    assert far["distance"] == pytest.approx(FARTHEST_DIST_1, abs=1e-5)


def test_dijkstra_path_stream(spark, graph1, proj):
    _nodes, roads = graph1
    stream = dijkstra(spark, roads, SOURCE, FARTHEST_1, projection=proj)
    rows = stream.collect()
    assert len(rows) == FARTHEST_HOPS_1
    assert rows[0]["NodeId"] == SOURCE and rows[0]["cost"] == 0.0
    assert rows[-1]["NodeId"] == FARTHEST_1
    assert rows[-1]["cost"] == pytest.approx(FARTHEST_DIST_1, abs=1e-5)
    costs = [r["cost"] for r in rows]
    assert costs == sorted(costs)  # cumulative cost is monotone (MAIN:310–326)
    summ = path_summary(stream).first()
    assert summ["PathNodeNumber"] == FARTHEST_HOPS_1
    assert summ["totalcost"] == pytest.approx(FARTHEST_DIST_1, abs=1e-5)


def test_astar_equals_dijkstra_cost(spark, graph1, proj):
    """Admissible-heuristic contract: optimal cost == Dijkstra
    (deliberate deviation from the reference's inadmissible heuristic,
    SURVEY.md §2.2 G4)."""
    nodes, roads = graph1
    d = dijkstra(spark, roads, SOURCE, FARTHEST_1, projection=proj).agg(F.max("cost")).first()[0]
    a = astar(spark, roads, nodes, SOURCE, FARTHEST_1, projection=proj).agg(F.max("cost")).first()[0]
    assert a == pytest.approx(d, abs=1e-9)


def test_yens_k(spark, graph1, proj):
    _nodes, roads = graph1
    res = yens_k(spark, roads, SOURCE, FARTHEST_1, k=3, projection=proj).collect()
    assert len(res) == 3
    totals = [r["totalCost"] for r in res]
    assert totals == sorted(totals)
    assert totals[0] == pytest.approx(FARTHEST_DIST_1, abs=1e-5)  # path#0 == Dijkstra (MAIN:703)
    for r in res:
        assert len(r["nodeIds"]) == len(r["costs"]) + 1
        assert sum(r["costs"]) == pytest.approx(r["totalCost"], abs=1e-9)
        assert len(set(r["nodeIds"])) == len(r["nodeIds"])  # loopless
    # distinct paths
    assert len({tuple(r["nodeIds"]) + (round(r["totalCost"], 9),) for r in res}) == 3


def test_apsp_topk(spark, graph1, proj, edge_rows):
    _nodes, roads = graph1
    got = [(r["source"], r["target"], r["distance"]) for r in apsp_topk(spark, roads, k=5, projection=proj).collect()]
    assert len(got) == 5
    # verify against oracle for the sources that appear
    for s, t, dist_val in got:
        want = bellman_ford_oracle(edge_rows, s)
        assert dist_val == pytest.approx(want[t], abs=1e-9)
    dists = [d for _, _, d in got]
    assert dists == sorted(dists, reverse=True)
    # landmark pruning must be invisible in the result
    unpruned = [
        (r["source"], r["target"], r["distance"])
        for r in apsp_topk(spark, roads, k=5, projection=proj, landmark_pruning=False).collect()
    ]
    assert got == unpruned


def test_bsp_full_equivalence_synthetic(spark):
    """BSP vs broadcast on a random low-diameter digraph, across all
    three kernels (SSSP / Dijkstra / A*)."""
    import random

    from bigdata_foundation_spark.graph.paths import build_projection as bp

    rng = random.Random(3)
    n = 60
    edges = []
    for u in range(n):
        for _ in range(3):
            v = rng.randrange(n)
            if v != u:
                edges.append((str(u), str(v), round(rng.uniform(1, 10), 3)))
    roads = spark.createDataFrame(edges, "src string, dst string, cost double")
    nodes = spark.createDataFrame(
        [(str(i), float(i % 10), float(i // 10)) for i in range(n)],
        "NodeId string, XCoord double, YCoord double",
    )
    proj2 = bp(roads, nodes)

    b = {r[0]: r[1] for r in sssp(spark, roads, "0", projection=proj2).collect()}
    s = {r[0]: r[1] for r in sssp(spark, roads, "0", strategy="bsp").collect()}
    assert set(b) == set(s)
    for k2 in b:
        assert b[k2] == pytest.approx(s[k2], abs=1e-9)

    target = max(b, key=b.get)
    pb = dijkstra(spark, roads, "0", target, projection=proj2).collect()
    ps = dijkstra(spark, roads, "0", target, strategy="bsp").collect()
    assert [r["NodeId"] for r in pb] == [r["NodeId"] for r in ps]

    ab = astar(spark, roads, nodes, "0", target, projection=proj2).collect()
    as_ = astar(spark, roads, nodes, "0", target, strategy="bsp").collect()
    assert ab[-1]["cost"] == pytest.approx(as_[-1]["cost"], abs=1e-9)
    assert ab[-1]["cost"] == pytest.approx(pb[-1]["cost"], abs=1e-9)


def test_bsp_dist_only_state_equals_path_carrying(spark):
    """carry_paths=False (r7 — the scale fix for the path-array
    checkpoint ceiling, KERNEL_BENCH §BSP): distances are bit-identical
    to the path-carrying state, and reconstruct_paths recovers from
    the parent forest exactly the shortest path the path-carrying run
    produced (unique-shortest-path graph, so no tie ambiguity)."""
    import random

    from bigdata_foundation_spark.graph import bsp as B

    rng = random.Random(11)
    n = 60
    edges = []
    for u in range(n):
        for _ in range(3):
            v = rng.randrange(n)
            if v != u:
                # distinct sums w.h.p. -> unique shortest paths
                edges.append((str(u), str(v), round(rng.uniform(1, 10), 6)))
    roads = spark.createDataFrame(edges, "src string, dst string, cost double")

    full = B.bsp_sssp(spark, roads, "0")
    lean = B.bsp_sssp(spark, roads, "0", carry_paths=False)
    fd = {r["node"]: r["dist"] for r in full.collect()}
    ld = {r["node"]: r["dist"] for r in lean.collect()}
    assert fd == ld  # bit-identical doubles, same relaxation order

    fpaths = {r["node"]: list(r["path"]) for r in full.collect()}
    far = max(fd, key=fd.get)
    rec = B.reconstruct_paths(lean, [far, "0"])
    assert rec[far] == fpaths[far]
    assert rec["0"] == ["0"]


def test_bsp_pruned_edge_probe_equivalence(spark):
    """Frontier-pruned edge probe (r9 — r8 verdict task 4): with
    ``prune_edge_probe`` active the candidate generation reads a
    ``src IN (frontier)`` filtered scan of the raw input instead of
    the cached projection — distances AND reconstructed paths must be
    bit-identical to the unpruned run (same (src, dst, min-cost) rows
    reach the same join), including when only SOME supersteps qualify
    (threshold smaller than the widest frontier) and on a multigraph
    (the per-superstep min-cost re-aggregation)."""
    import random

    from bigdata_foundation_spark.graph import bsp as B

    rng = random.Random(23)
    n = 80
    edges = []
    for u in range(n):
        for _ in range(3):
            v = rng.randrange(n)
            if v != u:
                edges.append((str(u), str(v), round(rng.uniform(1, 10), 6)))
    # parallel edges: pruned path must re-aggregate min-cost per step
    edges += [(a, b, c + 5.0) for a, b, c in edges[:40]]
    roads = spark.createDataFrame(edges, "src string, dst string, cost double")

    base = B.bsp_sssp(spark, roads, "0", carry_paths=False)
    bd = {r["node"]: r["dist"] for r in base.collect()}
    for thr in (100_000, 12):  # all supersteps pruned / only narrow ones
        pr = B.bsp_sssp(
            spark, roads, "0", carry_paths=False, prune_edge_probe=thr
        )
        pd_ = {r["node"]: r["dist"] for r in pr.collect()}
        assert pd_ == bd, thr  # bit-identical doubles
        far = max(bd, key=bd.get)
        assert B.reconstruct_paths(pr, [far]) == B.reconstruct_paths(base, [far])


def test_bsp_equals_broadcast(spark, graph1, proj):
    """Strategy equivalence on a bounded-depth query: the distributed
    BSP kernel and the broadcast heap kernel must agree exactly."""
    _nodes, roads = graph1
    # Pick a ~10-hop target so the BSP superstep count stays small.
    full_path = dijkstra(spark, roads, SOURCE, FARTHEST_1, projection=proj).collect()
    target = full_path[10]["NodeId"]
    b = dijkstra(spark, roads, SOURCE, target, projection=proj).collect()
    s = dijkstra(spark, roads, SOURCE, target, strategy="bsp").collect()
    assert [r["NodeId"] for r in b] == [r["NodeId"] for r in s]
    for rb, rs in zip(b, s):
        assert rb["cost"] == pytest.approx(rs["cost"], abs=1e-9)


def test_dijkstra_agg_golden(spark):
    """The reference's aggregate variant pins to the CSV1 goldens."""
    from bigdata_foundation_spark.queries import registry

    row = registry()["graph_dijkstra_agg"].fn(spark, "unused").collect()[0]
    assert row["PathNodeNumber"] == 66
    assert abs(row["totalcost"] - 9221.720431) < 1e-6


def test_sssp_slice_query(spark):
    """The CODE:54-shape slice query returns the tail window of the
    distance-ordered stream as scalar (pos, NodeId, distance) rows;
    the last element is the farthest golden."""
    from bigdata_foundation_spark.queries import registry

    rows = sorted(
        registry()["graph_sssp_slice"].fn(spark, "unused").collect(),
        key=lambda r: r["pos"],
    )
    assert [r["pos"] for r in rows] == list(range(10))
    assert rows[-1]["NodeId"] == "2802"  # farthest reachable (FIXTURES §3.2)
    assert abs(rows[-1]["distance"] - 9221.720431) < 1e-6
    dists = [r["distance"] for r in rows]
    assert dists == sorted(dists)


def test_sssp_csv7_farthest_golden(spark):
    from bigdata_foundation_spark.graph import load_graph, sssp

    nodes, roads = load_graph(spark, "/root/reference/Shenzhen_Edgelist_7.csv")
    d = sssp(spark, roads, "2022").collect()
    far = max(d, key=lambda r: r["distance"])
    assert far["NodeId"] == "1319"
    assert abs(far["distance"] - 98318.360585) < 1e-5


def test_projection_million_edges_compact():
    """The broadcast path's scale contract: a 1.2M-edge projection is
    numpy CSR (~16 B/edge + indptr) on the driver — never per-edge
    Python objects — and the columnar build is byte-identical to the
    row-iterable constructor (same dictionary-encoding order, which
    the heap kernels' tie-breaks and the pinned goldens depend on)."""
    import pickle

    import numpy as np

    from bigdata_foundation_spark.graph.kernel import Projection

    rng = np.random.default_rng(42)
    m, n = 1_200_000, 120_000
    src_i = rng.integers(0, n, m)
    dst_i = rng.integers(0, n, m)
    src = np.array([f"n{x}" for x in src_i], dtype=object)
    dst = np.array([f"n{x}" for x in dst_i], dtype=object)
    cost = rng.random(m) + 0.01
    proj = Projection.from_columns(src, dst, cost)

    # numpy CSR, bounded resident bytes (not ~100 B/edge object lists)
    assert proj.adj_v.dtype == np.int32 and proj.adj_e.dtype == np.int32
    assert proj.adj_w.dtype == np.float64 and proj.indptr.dtype == np.int64
    csr_bytes = proj.indptr.nbytes + proj.adj_v.nbytes + proj.adj_w.nbytes + proj.adj_e.nbytes
    assert csr_bytes < 21 * m / 1.0  # ≈16 B/edge + indptr

    # CSR slice correctness on a sampled node
    u = proj.index[f"n{src_i[0]}"]
    lo, hi = int(proj.indptr[u]), int(proj.indptr[u + 1])
    got = sorted(zip(proj.adj_v[lo:hi].tolist(), proj.adj_w[lo:hi].tolist()))
    mask = src == f"n{src_i[0]}"
    want = sorted(
        (proj.index[d], c) for d, c in zip(dst[mask].tolist(), cost[mask].tolist())
    )
    assert got == want

    # pickling (the broadcast) never ships the hot list views
    proj.hot()
    clone = pickle.loads(pickle.dumps(proj))
    assert clone._hot is None
    assert clone.adj_v.tolist()[:100] == proj.adj_v.tolist()[:100]

    # ... and the vectorized delta-stepping kernel (the path this size
    # dispatches to) beats the heap loop by the documented margin
    # (KERNEL_BENCH.md: 13× at 1M edges; bar set at 5× per the
    # round-3 verdict) while agreeing on every distance.
    import time

    from bigdata_foundation_spark.graph import kernel as K

    assert proj.n_edges >= K._NUMPY_DIST_EDGE_THRESHOLD  # dispatch covers this size
    proj.hot()
    sources = [proj.index["n0"], proj.index["n7"]]
    saved = K._NUMPY_DIST_EDGE_THRESHOLD
    try:
        K._NUMPY_DIST_EDGE_THRESHOLD = 1 << 60  # force heap
        t0 = time.perf_counter()
        heap_d = [K._dijkstra_dist(proj, s) for s in sources]
        t_heap = time.perf_counter() - t0
    finally:
        K._NUMPY_DIST_EDGE_THRESHOLD = saved
    t0 = time.perf_counter()
    np_d = [K._delta_dist_numpy(proj, s) for s in sources]
    t_np = time.perf_counter() - t0
    for h, d in zip(heap_d, np_d):
        ha = np.asarray(h)
        assert np.allclose(np.nan_to_num(ha, posinf=-1.0), np.nan_to_num(d, posinf=-1.0))
    assert t_heap / t_np >= 5.0, f"numpy kernel speedup {t_heap/t_np:.1f}x < 5x"


def test_numpy_kernel_exact_on_int_weights(monkeypatch):
    """Integer-valued weights make every path sum exactly representable
    in float64, so the heap and numpy kernels must agree BIT-exactly —
    including through the per_source_longest top-k tie-breaks (equal
    distances are common with small integer weights)."""
    import numpy as np

    from bigdata_foundation_spark.graph import kernel as K

    rng = np.random.default_rng(5)
    n, m = 400, 2400
    src = np.array([f"n{x}" for x in rng.integers(0, n, m)], dtype=object)
    dst = np.array([f"n{x}" for x in rng.integers(0, n, m)], dtype=object)
    cost = rng.integers(1, 9, m).astype(np.float64)
    proj = K.Projection.from_columns(src, dst, cost)

    for s in (0, 17, 256):
        heap_d = K._dijkstra_dist(proj, s)  # below threshold → heap
        np_d = K._delta_dist_numpy(proj, s)
        assert heap_d == np_d.tolist()

    srcs = [proj.ids[i] for i in range(0, len(proj.ids), 37)]
    want = K.per_source_longest(proj, srcs, 5)
    monkeypatch.setattr(K, "_NUMPY_DIST_EDGE_THRESHOLD", 1)  # force numpy path
    got = K.per_source_longest(proj, srcs, 5)
    assert got == want


def test_numpy_kernel_exact_on_grid_with_adaptive_delta():
    """High-diameter road-like shape (lattice): enough bucket rounds
    that the adaptive delta-widening (×4 every 16 buckets) actually
    fires several times — exactness must hold through every widening
    step, not just the classic mean-weight delta the dense synthetics
    stay on. Integer weights pin bit-exact agreement with the heap."""
    import numpy as np

    from bigdata_foundation_spark.graph import kernel as K

    rng = np.random.default_rng(11)
    r = c = 60  # ~3,600 nodes, ~14k directed edges, ~120-hop diameter
    idx = np.arange(r * c).reshape(r, c)
    pieces = []
    a, b = idx[:, :-1].ravel(), idx[:, 1:].ravel()
    pieces += [(a, b), (b, a)]
    a, b = idx[:-1, :].ravel(), idx[1:, :].ravel()
    pieces += [(a, b), (b, a)]
    src = np.concatenate([p[0] for p in pieces])
    dst = np.concatenate([p[1] for p in pieces])
    cost = rng.integers(50, 150, len(src)).astype(np.float64)
    ids = np.array([f"n{i}" for i in range(r * c)], dtype=object)
    proj = K.Projection.from_columns(ids[src], ids[dst], cost)

    for s in (0, r * c // 2, r * c - 1):
        heap_d = K._dijkstra_dist(proj, s)  # below threshold → heap
        np_d = K._delta_dist_numpy(proj, s)
        assert heap_d == np_d.tolist()


def test_projection_columnar_equals_row_build():
    """from_columns == the row-iterable constructor, element for
    element (ids, index, CSR layout, edge identities)."""
    import numpy as np

    from bigdata_foundation_spark.graph.kernel import Projection

    rng = np.random.default_rng(7)
    m = 5000
    src = [f"v{int(x)}" for x in rng.integers(0, 500, m)]
    dst = [f"v{int(x)}" for x in rng.integers(0, 500, m)]
    cost = [float(c) for c in (rng.random(m) + 0.01)]

    a = Projection(zip(src, dst, cost))
    b = Projection.from_columns(
        np.array(src, dtype=object), np.array(dst, dtype=object), np.array(cost)
    )
    assert a.ids == b.ids and a.index == b.index
    assert a.indptr.tolist() == b.indptr.tolist()
    assert a.adj_v.tolist() == b.adj_v.tolist()
    assert a.adj_w.tolist() == b.adj_w.tolist()
    assert a.adj_e.tolist() == b.adj_e.tolist()


def test_apsp_bsp_equals_broadcast(spark):
    """G3's BSP fallback (wave-batched multi-source relaxation) must
    return exactly the broadcast heap kernel's top-k, including the
    3-key tie-break, on a synthetic low-diameter digraph."""
    import random

    rng = random.Random(11)
    n = 50
    edges = []
    for u in range(n):
        for _ in range(3):
            v = rng.randrange(n)
            if v != u:
                edges.append((str(u), str(v), round(rng.uniform(1, 10), 3)))
    roads = spark.createDataFrame(edges, "src string, dst string, cost double")

    b = [
        (r["source"], r["target"], r["distance"])
        for r in apsp_topk(spark, roads, k=7, strategy="broadcast").collect()
    ]
    s = [
        (r["source"], r["target"], r["distance"])
        for r in apsp_topk(spark, roads, k=7, strategy="bsp", bsp_wave_size=16).collect()
    ]
    assert len(b) == len(s) == 7
    for (bs, bt, bd), (ss, st, sd) in zip(b, s):
        assert (bs, bt) == (ss, st)
        assert bd == pytest.approx(sd, abs=1e-9)


def test_apsp_bsp_driver_rows_bounded(spark, monkeypatch):
    """The BSP fallback's scale contract: the driver never holds more
    than one wave of source ids at a time (each multi-SSSP call is
    seeded with ≤ wave_size sources), and together the waves partition
    the full source set — no all-sources collect anywhere."""
    import random

    from bigdata_foundation_spark.graph import bsp as _bsp_mod
    from bigdata_foundation_spark.graph import paths as _paths_mod

    rng = random.Random(3)
    n = 60
    edges = []
    for u in range(n):
        for _ in range(2):
            v = rng.randrange(n)
            if v != u:
                edges.append((str(u), str(v), round(rng.uniform(1, 10), 3)))
    roads = spark.createDataFrame(edges, "src string, dst string, cost double")
    all_sources = {e[0] for e in edges}

    seen_waves: list[list[str]] = []
    real = _bsp_mod.bsp_multi_sssp

    def spy(spark_, roads_, sources, **kw):
        seen_waves.append(list(sources))
        return real(spark_, roads_, sources, **kw)

    monkeypatch.setattr(_bsp_mod, "bsp_multi_sssp", spy)
    wave_size = 16
    got = apsp_topk(spark, roads, k=5, strategy="bsp", bsp_wave_size=wave_size).collect()
    assert len(got) == 5
    assert seen_waves, "bsp fallback never invoked the multi-SSSP kernel"
    assert all(len(w) <= wave_size for w in seen_waves)
    covered = set().union(*(set(w) for w in seen_waves))
    assert covered == all_sources
    # waves partition (no source visited twice)
    assert sum(len(w) for w in seen_waves) == len(all_sources)
    # bounded: with |sources| ≈ 60 and wave_size 16, several waves
    assert len(seen_waves) >= 3
    # sanity vs broadcast
    monkeypatch.undo()
    b = apsp_topk(spark, roads, k=5, strategy="broadcast").collect()
    assert [(r[0], r[1]) for r in got] == [(r[0], r[1]) for r in b]


def test_yens_k_auto_dispatches_bsp_beyond_broadcast(spark, monkeypatch):
    """yens_k(strategy='auto') past BROADCAST_EDGE_LIMIT must dispatch
    to the BSP Yen (never collect a projection that would OOM the
    driver) and return the same paths broadcast would."""
    from bigdata_foundation_spark.graph import bsp as _bsp_mod
    from bigdata_foundation_spark.graph import paths as _paths_mod

    roads = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 5.0)],
        "src string, dst string, cost double",
    )
    monkeypatch.setattr(_paths_mod, "BROADCAST_EDGE_LIMIT", 2)
    _paths_mod._COUNT_MEMO.clear()
    calls: list[int] = []
    real = _bsp_mod.bsp_yens_k

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(_paths_mod._bsp, "bsp_yens_k", spy)
    got = yens_k(spark, roads, "a", "c", k=2).collect()
    assert calls, "auto past the limit must run the BSP Yen"
    assert [r["totalCost"] for r in got] == [2.0, 5.0]
    assert [r["nodeIds"] for r in got] == [["a", "b", "c"], ["a", "c"]]
    # forcing broadcast still works and agrees
    monkeypatch.undo()
    _paths_mod._COUNT_MEMO.clear()
    b = yens_k(spark, roads, "a", "c", k=2, strategy="broadcast").collect()
    assert [r["totalCost"] for r in b] == [2.0, 5.0]
    _paths_mod._COUNT_MEMO.clear()


def test_bsp_yens_equals_broadcast_multigraph(spark):
    """BSP Yen vs broadcast Yen on a random low-diameter MULTIGRAPH
    (parallel edges with distinct road_id/cost force true edge-identity
    masking — endpoint masking would wrongly kill the parallel edge)."""
    import random

    rng = random.Random(11)
    n = 30
    edges = []
    eid = 0
    for u in range(n):
        for _ in range(3):
            v = rng.randrange(n)
            if v == u:
                continue
            edges.append((str(u), str(v), f"r{eid}", round(rng.uniform(1.0, 9.0), 3)))
            eid += 1
            if rng.random() < 0.3:  # parallel edge, different cost
                edges.append(
                    (str(u), str(v), f"r{eid}", round(rng.uniform(1.0, 9.0), 3))
                )
                eid += 1
    roads = spark.createDataFrame(edges, "src string, dst string, road_id string, cost double")

    b = yens_k(spark, roads, "0", str(n - 1), k=4, strategy="broadcast").collect()
    s = yens_k(spark, roads, "0", str(n - 1), k=4, strategy="bsp").collect()
    assert len(b) == len(s) == 4
    for rb, rs in zip(b, s):
        assert rb["totalCost"] == pytest.approx(rs["totalCost"], abs=1e-9)
    # path #0 must be the Dijkstra path on both strategies
    assert b[0]["nodeIds"] == s[0]["nodeIds"]
    # loopless + monotone costs on the BSP side
    for r in s:
        assert len(set(r["nodeIds"])) == len(r["nodeIds"])
    totals = [r["totalCost"] for r in s]
    assert totals == sorted(totals)


def test_bsp_yens_probe_wave_batching(spark):
    """probes_per_wave bounds distributed state without changing
    results: forcing 2-probe waves must reproduce the unbatched
    answer on a multigraph with parallel edges."""
    from bigdata_foundation_spark.graph.bsp import bsp_yens_k

    edges = [
        ("a", "b", "r1", 1.0),
        ("b", "c", "r2", 1.0),
        ("c", "d", "r3", 1.0),
        ("a", "c", "r4", 3.5),
        ("b", "d", "r5", 3.0),
        ("a", "b", "r6", 2.0),  # parallel to r1
        ("c", "d", "r7", 1.5),  # parallel to r3
    ]
    roads = spark.createDataFrame(edges, "src string, dst string, road_id string, cost double")
    full = bsp_yens_k(spark, roads, "a", "d", k=4, probes_per_wave=64)
    waved = bsp_yens_k(spark, roads, "a", "d", k=4, probes_per_wave=2)
    assert [(p, round(t, 9)) for p, _c, t in full] == [
        (p, round(t, 9)) for p, _c, t in waved
    ]
    assert full[0][2] == pytest.approx(3.0)  # a-b-c-d via r1,r2,r3


def test_projection_rejects_negative_costs(spark):
    """Dijkstra/delta-stepping/A*/ALT all assume non-negative weights;
    a negative cost must be rejected loudly at projection build, not
    silently corrupt every distance downstream."""
    import pytest as _pytest

    roads = spark.createDataFrame(
        [("a", "b", 1.0, "r1"), ("b", "c", -0.5, "r2")],
        "src string, dst string, cost double, road_id string",
    )
    with _pytest.raises(ValueError, match="negative edge cost"):
        build_projection(roads)


def test_bidirectional_dijkstra_equivalence(spark, graph1):
    """Bidirectional Dijkstra (Pohl 1971): exact same cost as the
    single-sided kernel on the CSV1 golden pair and on random pairs;
    path is valid (edges exist, hop costs sum to the distance); the
    unreachable case returns an empty frame like the forward path."""
    import random

    from bigdata_foundation_spark.graph import kernel as K

    nodes, roads = graph1
    proj = build_projection(roads, nodes)

    fwd = dijkstra(spark, roads, "2022", "2802", projection=proj).collect()
    bid = dijkstra(
        spark, roads, "2022", "2802", projection=proj, bidirectional=True
    ).collect()
    assert abs(fwd[-1]["cost"] - bid[-1]["cost"]) < 1e-6
    assert fwd[-1]["cost"] == pytest.approx(9221.720431, abs=1e-4)
    assert bid[0]["NodeId"] == "2022" and bid[-1]["NodeId"] == "2802"

    rng = random.Random(11)
    ids = proj.ids
    checked = 0
    while checked < 10:
        a, b = rng.choice(ids), rng.choice(ids)
        sp = K.shortest_path(proj, a, b)
        got = K.bidirectional_shortest_path(proj, a, b)
        if sp is None:
            assert got is None
            continue
        assert got is not None
        assert abs(sum(sp[1]) - sum(got[1])) < 1e-9
        # validity: every hop is a real edge with that cost
        index = proj.index
        for (u, v, w) in zip(got[0], got[0][1:], got[1]):
            ui = index[u]
            lo, hi = proj.indptr[ui], proj.indptr[ui + 1]
            cand = [
                float(proj.adj_w[i])
                for i in range(lo, hi)
                if proj.ids[proj.adj_v[i]] == v
            ]
            assert any(abs(c - w) < 1e-9 for c in cand), (u, v, w)
        checked += 1


def test_bidirectional_flag_forces_broadcast_strategy(spark, graph1, monkeypatch):
    """ADVICE r5: dijkstra(..., bidirectional=True) used to fall into
    the BSP dispatch before the flag was consulted when the strategy
    resolved to 'bsp', silently no-opping the requested algorithm.
    The flag must force the broadcast path: with bsp_sssp poisoned,
    the call still succeeds and returns the golden cost."""
    from bigdata_foundation_spark.graph import paths as P

    nodes, roads = graph1

    def _boom(*a, **k):  # pragma: no cover - failure branch
        raise AssertionError("BSP dispatched despite bidirectional=True")

    monkeypatch.setattr(P._bsp, "bsp_sssp", _boom)
    got = dijkstra(
        spark, roads, "2022", "2802", strategy="bsp", bidirectional=True
    ).collect()
    assert got[-1]["cost"] == pytest.approx(FARTHEST_DIST_1, abs=1e-4)


def test_harmonic_rounds_half_up_like_oracle(spark):
    """ADVICE r5 (medium): the harmonic sum must round the way the
    golden generator's r6 does (HALF_UP on the shortest decimal repr,
    i.e. Spark F.round), NOT Python round() (half-even on the binary
    double). Cost 8.100019035044733 makes H = 1/cost == 0.1234565
    exactly: round() gives 0.123456, r6/F.round give 0.123457."""
    from bigdata_foundation_spark.graph.paths import harmonic_centrality

    roads = spark.createDataFrame(
        [("a", "b", 8.100019035044733, "r1")],
        "src string, dst string, cost double, road_id string",
    )
    rows = {r["NodeId"]: r for r in harmonic_centrality(spark, roads, n_sources=16).collect()}
    assert rows["a"]["harmonic"] == 0.123457
    assert rows["a"]["n_reachable"] == 1
    assert rows["b"]["harmonic"] == 0.0


def test_centralities_reject_zero_weight_edges(spark):
    """ADVICE r5: a zero-cost edge lets a successor settle at the same
    distance as its predecessor, dropping sigma/pred contributions in
    Brandes, and harmonic's d>0 filter would treat 0-distance reachable
    nodes as unreachable — both must refuse loudly instead."""
    from bigdata_foundation_spark.graph.paths import (
        betweenness_centrality,
        harmonic_centrality,
    )

    roads = spark.createDataFrame(
        [("a", "b", 0.0, "r1"), ("b", "c", 1.0, "r2")],
        "src string, dst string, cost double, road_id string",
    )
    with pytest.raises(ValueError, match="zero-cost edge"):
        harmonic_centrality(spark, roads, n_sources=4)
    with pytest.raises(ValueError, match="zero-cost edge"):
        betweenness_centrality(spark, roads, n_sources=4)


def test_betweenness_sampled_error_bound_vs_exact(spark, graph1, proj):
    """r5 verdict task 4: the sampled centralities verified replay
    equality but nothing bounded sampling error vs the exact statistic.
    On CSV1 exact is cheap (every node a source), so pin the 16-source
    estimator against it: rank recall (>= 8 of the exact top-10 inside
    the sampled top-50) and scaled-value error (x |V|/16, Brandes &
    Pich 2007 unbiased estimator: median relative error over the exact
    top-50 <= 0.25, max <= 0.75 — measured 0.125 / 0.459; the sample
    is hash-deterministic so this is a regression pin, not a flaky
    probabilistic bound). The exact side runs IN-ENGINE via
    ``n_sources=None`` (r7: the exact all-source tier — every node a
    source as parallel executor tasks), not a driver-side replay."""
    import statistics

    from bigdata_foundation_spark.graph.paths import betweenness_centrality

    _nodes, roads = graph1
    n = len(proj.ids)
    exact = {
        r["NodeId"]: r["betweenness"]
        for r in betweenness_centrality(
            spark, roads, n_sources=None, k=4000, projection=proj
        ).collect()
    }
    sampled = {
        r["NodeId"]: r["betweenness"]
        for r in betweenness_centrality(
            spark, roads, n_sources=16, k=4000, projection=proj
        ).collect()
    }
    top_exact = sorted(exact, key=lambda k: (-exact[k], k))
    top_samp = set(sorted(sampled, key=lambda k: (-sampled[k], k))[:50])
    assert len(set(top_exact[:10]) & top_samp) >= 8

    scale = n / 16
    errs = [
        abs(sampled.get(k, 0.0) * scale - exact[k]) / exact[k] for k in top_exact[:50]
    ]
    assert statistics.median(errs) <= 0.25, statistics.median(errs)
    assert max(errs) <= 0.75, max(errs)


def test_harmonic_sampled_values_are_exact(spark, graph1, proj):
    """Harmonic has NO estimation error: n_sources selects which nodes
    are reported, each value is the exact H(s). Cross-check each of
    the 16 sampled rows against an independent driver-side kernel SSSP
    + Decimal HALF_UP rounding (the golden generator's r6)."""
    from decimal import ROUND_HALF_UP, Decimal

    from bigdata_foundation_spark.graph import kernel as K
    from bigdata_foundation_spark.graph.paths import harmonic_centrality

    _nodes, roads = graph1
    rows = harmonic_centrality(spark, roads, n_sources=16, projection=proj).collect()
    assert len(rows) == 16
    for r in rows:
        dist = K.sssp(proj, r["NodeId"])
        h = sum((1.0 / d for d in dist.values() if d > 0.0), 0.0)
        expect = float(
            Decimal(repr(h)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )
        assert r["harmonic"] == expect, r["NodeId"]
        assert r["n_reachable"] == sum(1 for d in dist.values() if d > 0.0)


def test_closeness_sampled_values_are_exact(spark, graph1, proj):
    """Closeness mirrors harmonic's contract: no estimation error —
    each sampled row is the exact C(s) = r/Σd, cross-checked against
    an independent driver-side kernel SSSP + Decimal HALF_UP rounding.
    The sampled node set must be identical to harmonic's (same
    hash-spread selection)."""
    from decimal import ROUND_HALF_UP, Decimal

    from bigdata_foundation_spark.graph import kernel as K
    from bigdata_foundation_spark.graph.paths import (
        closeness_centrality,
        harmonic_centrality,
    )

    _nodes, roads = graph1
    rows = closeness_centrality(spark, roads, n_sources=16, projection=proj).collect()
    assert len(rows) == 16
    for r in rows:
        dist = K.sssp(proj, r["NodeId"])
        tot = sum((d for d in dist.values() if d > 0.0), 0.0)
        n = sum(1 for d in dist.values() if d > 0.0)
        c = (n / tot) if tot > 0.0 else 0.0
        expect = float(
            Decimal(repr(c)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )
        assert r["closeness"] == expect, r["NodeId"]
        assert r["n_reachable"] == n
    h_nodes = {
        r["NodeId"]
        for r in harmonic_centrality(spark, roads, n_sources=16, projection=proj).collect()
    }
    assert {r["NodeId"] for r in rows} == h_nodes


def test_closeness_wasserman_faust(spark, graph1, proj):
    """wf_correction=True scales by r/(|V|-1): every value lands in
    [0, 1], equals the uncorrected value times the reachability
    fraction, and preserves 0.0 for sources reaching nothing."""
    from bigdata_foundation_spark.graph.paths import closeness_centrality

    _nodes, roads = graph1
    n_nodes = roads.selectExpr("src AS id").union(roads.selectExpr("dst AS id")).distinct().count()
    plain = {r["NodeId"]: r for r in closeness_centrality(spark, roads, n_sources=16, projection=proj).collect()}
    wf = {r["NodeId"]: r for r in closeness_centrality(
        spark, roads, n_sources=16, wf_correction=True, projection=proj
    ).collect()}
    assert set(wf) == set(plain)
    for nid, r in wf.items():
        assert 0.0 <= r["closeness"] <= 1.0
        expect = plain[nid]["closeness"] * r["n_reachable"] / (n_nodes - 1)
        assert abs(r["closeness"] - expect) < 2e-6  # both sides 6-dp rounded


def test_eccentricity_sampled_values_are_exact(spark, graph1, proj):
    """Eccentricity mirrors the closeness/harmonic contract: each
    sampled row is the exact max distance, cross-checked against a
    driver-side kernel SSSP; the sampled node set is identical to the
    family's; max(ecc) over closeness-family samples lower-bounds the
    directed diameter by construction."""
    from bigdata_foundation_spark.graph import kernel as K
    from bigdata_foundation_spark.graph.paths import eccentricity, harmonic_centrality

    _nodes, roads = graph1
    from decimal import ROUND_HALF_UP, Decimal

    rows = eccentricity(spark, roads, n_sources=16, projection=proj).collect()
    assert len(rows) == 16
    for r in rows:
        dist = K.sssp(proj, r["NodeId"])
        pos = [d for node, d in dist.items() if node != r["NodeId"]]
        expect = float(
            Decimal(repr(max(pos, default=0.0))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        assert r["eccentricity"] == expect, r["NodeId"]
        assert r["n_reachable"] == len(pos)
    h_nodes = {
        r["NodeId"]
        for r in harmonic_centrality(spark, roads, n_sources=16, projection=proj).collect()
    }
    assert {r["NodeId"] for r in rows} == h_nodes
