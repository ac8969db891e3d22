"""Exact in-memory path kernels (no Spark imports — runs inside tasks).

This module is the compute core that executes *inside executor tasks*
over a broadcast graph projection (see ``paths.py``). It mirrors the
reference's execution model: GDS materializes an in-memory projection
and runs the algorithm single-machine even in cluster mode
(neo4j-code.txt:3–15; SURVEY.md §4.2). Our scale story is different —
the projection is broadcast once and *queries* are distributed across
executors (one task per source for SSSP/APSP waves) — but the per-query
kernel is the same binary-heap Dijkstra family.

For graphs too large to broadcast, ``bsp.py`` provides the distributed
whole-frontier relaxation kernel; ``paths.py`` dispatches.

The graph is a directed weighted **multigraph**: parallel edges with
distinct road ids / costs are preserved (MAIN:221–227), and Yen's
masking is per physical edge, so a same-node-sequence path over a
costlier parallel edge is a distinct path — matching GDS's
relationship-sequence path identity (neo4j-code.txt:127–145).
"""

from __future__ import annotations

import heapq
from collections import defaultdict
from typing import Iterable, Sequence


class Projection:
    """Compressed adjacency built from (src, dst, cost) rows.

    Picklable/broadcastable. ``adj[u]`` is a list of
    ``(v, cost, edge_idx)`` triples; ``coords`` optionally maps node id
    → (x, y) for the A* heuristic.
    """

    __slots__ = ("adj", "coords", "n_edges")

    def __init__(self, edges: Iterable[tuple[str, str, float]], coords: dict[str, tuple[float, float]] | None = None):
        adj: dict[str, list[tuple[str, float, int]]] = defaultdict(list)
        n = 0
        for src, dst, cost in edges:
            adj[src].append((dst, float(cost), n))
            n += 1
        self.adj = dict(adj)
        self.coords = coords or {}
        self.n_edges = n


def _heuristic_factory(proj: Projection, target: str | None):
    """Admissible Euclidean heuristic on the planar projected-meter
    coordinates. NOTE semantic contract (SURVEY.md §2.2 G4): the
    reference feeds projected meters into GDS's haversine heuristic,
    making it inadmissible (its A* returns cost 54140.0 vs Dijkstra's
    48175.55, MAIN:480–487). We implement the *admissible* planar
    heuristic, so our A* returns optimal costs equal to Dijkstra; the
    deviation is deliberate and documented.
    """
    if target is None or target not in proj.coords:
        return lambda _u: 0.0
    tx, ty = proj.coords[target]
    coords = proj.coords

    def h(u: str) -> float:
        c = coords.get(u)
        if c is None:
            return 0.0
        dx = c[0] - tx
        dy = c[1] - ty
        return (dx * dx + dy * dy) ** 0.5

    return h


def dijkstra(
    proj: Projection,
    source: str,
    target: str | None = None,
    use_heuristic: bool = False,
    excluded_edges: frozenset[int] | set[int] | None = None,
    excluded_nodes: frozenset[str] | set[str] | None = None,
) -> tuple[dict[str, float], dict[str, tuple[str, float, int]]]:
    """Binary-heap Dijkstra; with ``use_heuristic`` it is A*.

    Returns (dist, parent) where parent[v] = (u, edge_cost, edge_idx).
    With a target, stops as soon as the target is settled (the
    point-to-point early-termination the reference gets from
    gds.alpha.shortestPath vs the full SSSP, neo4j-code.txt:1–17).
    """
    excluded_edges = excluded_edges or frozenset()
    excluded_nodes = excluded_nodes or frozenset()
    h = _heuristic_factory(proj, target) if use_heuristic else (lambda _u: 0.0)

    dist: dict[str, float] = {source: 0.0}
    parent: dict[str, tuple[str, float, int]] = {}
    settled: set[str] = set()
    pq: list[tuple[float, str]] = [(h(source), source)]
    adj = proj.adj

    while pq:
        _f, u = heapq.heappop(pq)
        if u in settled:
            continue
        settled.add(u)
        if u == target:
            break
        du = dist[u]
        for v, w, eidx in adj.get(u, ()):
            if eidx in excluded_edges or v in excluded_nodes:
                continue
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                parent[v] = (u, w, eidx)
                heapq.heappush(pq, (nd + h(v), v))
    return dist, parent


def reconstruct(parent: dict[str, tuple[str, float, int]], source: str, target: str):
    """parent map → (nodes, hop_costs, edge_idxs); None if unreachable."""
    if target != source and target not in parent:
        return None
    nodes = [target]
    costs: list[float] = []
    eidxs: list[int] = []
    cur = target
    while cur != source:
        u, w, eidx = parent[cur]
        nodes.append(u)
        costs.append(w)
        eidxs.append(eidx)
        cur = u
    nodes.reverse()
    costs.reverse()
    eidxs.reverse()
    return nodes, costs, eidxs


def shortest_path(
    proj: Projection,
    source: str,
    target: str,
    use_heuristic: bool = False,
) -> tuple[list[str], list[float]] | None:
    """Point-to-point path as (node sequence, per-hop costs)."""
    _dist, parent = dijkstra(proj, source, target, use_heuristic=use_heuristic)
    r = reconstruct(parent, source, target)
    return (r[0], r[1]) if r else None


def sssp(proj: Projection, source: str) -> dict[str, float]:
    """Single-source distances to every reachable node (G2 semantics;
    delta-stepping's ``delta`` is a scheduling knob with no effect on
    results — SURVEY.md §2.2 G2)."""
    dist, _ = dijkstra(proj, source)
    return dist


def yens_k(proj: Projection, source: str, target: str, k: int) -> list[tuple[list[str], list[float]]]:
    """Yen's K loopless shortest paths (G5, neo4j-code.txt:127–165).

    Path identity is the physical-edge sequence (multigraph-aware).
    Returns up to k (nodes, hop_costs) pairs ordered by total cost.
    """
    first = dijkstra(proj, source, target)
    r = reconstruct(first[1], source, target)
    if r is None:
        return []
    a_paths: list[tuple[list[str], list[float], list[int]]] = [r]
    candidates: list[tuple[float, list[str], list[float], list[int]]] = []
    seen: set[tuple[int, ...]] = {tuple(r[2])}

    while len(a_paths) < k:
        prev_nodes, prev_costs, prev_eidxs = a_paths[-1]
        for i in range(len(prev_nodes) - 1):
            spur = prev_nodes[i]
            root_nodes = prev_nodes[: i + 1]
            root_costs = prev_costs[:i]
            root_eidxs = prev_eidxs[:i]
            # Mask the outgoing edge each accepted path with this root
            # prefix takes from the spur node.
            masked_edges: set[int] = set()
            for p_nodes, _pc, p_eidxs in a_paths:
                if p_nodes[: i + 1] == root_nodes and len(p_eidxs) > i:
                    masked_edges.add(p_eidxs[i])
            masked_nodes = frozenset(root_nodes[:-1])
            _d, par = dijkstra(
                proj,
                spur,
                target,
                excluded_edges=frozenset(masked_edges),
                excluded_nodes=masked_nodes,
            )
            sp = reconstruct(par, spur, target)
            if sp is None:
                continue
            nodes = root_nodes[:-1] + sp[0]
            costs = root_costs + sp[1]
            eidxs = root_eidxs + sp[2]
            key = tuple(eidxs)
            if key in seen:
                continue
            seen.add(key)
            heapq.heappush(candidates, (sum(costs), nodes, costs, eidxs))
        if not candidates:
            break
        _total, nodes, costs, eidxs = heapq.heappop(candidates)
        a_paths.append((nodes, costs, eidxs))

    return [(n, c) for n, c, _e in a_paths]


def per_source_longest(
    proj: Projection, sources: Sequence[str], topk: int
) -> list[tuple[str, str, float]]:
    """For each source, the ``topk`` largest finite shortest-path
    distances (self-pairs excluded). Used by the distributed APSP:
    the global top-k over all pairs is contained in the union of
    per-source top-k, so each task emits only ``topk`` rows per source
    (map-side top-k; neo4j-code.txt:56–77 post-pipeline)."""
    out: list[tuple[str, str, float]] = []
    for s in sources:
        dist, _ = dijkstra(proj, s)
        dist.pop(s, None)
        if not dist:
            continue
        # Tie-break must match the global ORDER BY distance DESC,
        # source ASC, target ASC — so among equal distances keep the
        # lexicographically smallest targets.
        best = sorted(dist.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
        out.extend((s, t, d) for t, d in best)
    return out
