"""Generate pinned-golden DuckDB oracles for the graph queries.

The graph algorithms (iterative heap/BSP search) are not expressible as
one ANSI-SQL query, so instead of leaving them rows-only we pin their
expected output as a ``VALUES`` table computed by THIS script's
independent pure-Python implementations (csv module + heapq Dijkstra /
Yen / APSP — no engine code imported). This mirrors the reference's own
golden-output verification practice (SURVEY.md §5.1) and gives the
driver's hash gate real values to compare.

The graph queries always run on ``Shenzhen_Edgelist_1.csv`` (the
reference's own data, fixed regardless of sf), so the goldens are
stable. Output: ``bigdata_foundation_spark/graph_goldens.py``.

Rounding matches Spark's ROUND half-up on the shortest decimal repr of
the double, so the literal parsed back by DuckDB is bit-identical to
Spark's rounded double.
"""

from __future__ import annotations

import csv
import heapq
import math
from decimal import ROUND_HALF_UP, Decimal

CSV1 = "/root/reference/Shenzhen_Edgelist_1.csv"
SOURCE, TARGET = "2022", "2802"


def r6(x: float) -> float:
    """Spark-compatible round-half-up to 6 dp of a double."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def load_graph():
    """Independent re-implementation of the reference's ETL semantics
    (SURVEY.md §2.1 I1–I6): drop blank rows, nodes from START_NODE,
    dangling-edge drop, quadruple dedup, multigraph kept."""
    rows = []
    with open(CSV1, newline="") as f:
        for rec in csv.DictReader(f):
            if not rec["START_NODE"]:
                continue
            rows.append((rec["START_NODE"], rec["END_NODE"], rec["EDGE"], float(rec["LENGTH"])))
    node_ids = {s for s, *_ in rows}
    quad = sorted({(s, d, e, c) for s, d, e, c in rows if d in node_ids})
    adj: dict[str, list[tuple[str, float]]] = {}
    for s, d, _e, c in quad:
        adj.setdefault(s, []).append((d, c))
    return node_ids, quad, adj


def dijkstra(adj, src, banned_edges=frozenset(), banned_nodes=frozenset(), target=None):
    """Heap Dijkstra; deterministic tie-break by node id string."""
    dist = {src: 0.0}
    parent: dict[str, str] = {}
    pq = [(0.0, src)]
    done = set()
    while pq:
        d, u = heapq.heappop(pq)
        if u in done:
            continue
        done.add(u)
        if target is not None and u == target:
            break
        for v, c in adj.get(u, ()):
            if v in banned_nodes or (u, v, c) in banned_edges:
                continue
            nd = d + c
            if nd < dist.get(v, math.inf) - 1e-12:
                dist[v] = nd
                parent[v] = u
                heapq.heappush(pq, (nd, v))
    return dist, parent


def path_of(parent, src, dst):
    if dst != src and dst not in parent:
        return None
    p = [dst]
    while p[-1] != src:
        p.append(parent[p[-1]])
    return p[::-1]


def min_cost(adj, u, v):
    return min(c for (d, c) in adj.get(u, ()) if d == v)


def yen_k3(adj, src, dst, k=3):
    """Independent Yen's algorithm (loopless K shortest paths)."""
    dist, parent = dijkstra(adj, src, target=dst)
    first = path_of(parent, src, dst)
    a = [(dist[dst], first)]
    candidates: list[tuple[float, tuple]] = []
    seen = {tuple(first)}
    while len(a) < k:
        _, prev = a[-1]
        for i in range(len(prev) - 1):
            spur, root = prev[i], prev[: i + 1]
            root_cost = sum(min_cost(adj, root[j], root[j + 1]) for j in range(len(root) - 1))
            banned_edges = set()
            for _c, p in a:
                if len(p) > i and p[: i + 1] == root:
                    banned_edges.add((p[i], p[i + 1], min_cost(adj, p[i], p[i + 1])))
            # ban ALL parallel edges between those endpoint pairs (path
            # identity is the node sequence, matching the engine)
            banned_pairs = {(e[0], e[1]) for e in banned_edges}
            full_ban = {
                (u, v, c)
                for u in {e[0] for e in banned_pairs}
                for (v, c) in adj.get(u, ())
                if (u, v) in banned_pairs
            }
            banned_nodes = set(root[:-1])
            sd, sp = dijkstra(adj, spur, banned_edges=full_ban, banned_nodes=banned_nodes, target=dst)
            if dst not in sd:
                continue
            spur_path = path_of(sp, spur, dst)
            total = root_cost + sd[dst]
            cand = root[:-1] + spur_path
            tc = tuple(cand)
            if tc not in seen:
                seen.add(tc)
                heapq.heappush(candidates, (total, tc))
        if not candidates:
            break
        total, best = heapq.heappop(candidates)
        a.append((total, list(best)))
    return a


def main() -> None:
    node_ids, quad, adj = load_graph()
    assert len(node_ids) == 3705 and len(quad) == 9696, (len(node_ids), len(quad))

    dist, parent = dijkstra(adj, SOURCE)
    assert len(dist) == 2191
    far = max(dist.items(), key=lambda kv: (kv[1], kv[0]))
    assert far[0] == TARGET and abs(far[1] - 9221.720431) < 1e-5

    oracles: dict[str, str] = {}
    note = (
        "-- pinned golden computed by tools/gen_graph_goldens.py's\n"
        "    -- INDEPENDENT pure-Python implementation (iterative graph\n"
        "    -- search is not expressible as one SQL query)\n    "
    )

    def values_sql(cols: list[tuple[str, str]], rows: list[tuple]) -> str:
        body = ",\n      ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
        sel = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in cols)
        names = ", ".join(n for n, _t in cols)
        return f"{note}SELECT {sel} FROM (VALUES\n      {body}\n    ) AS t({names})"

    # --- graph_sssp: (NodeId, distance r6), all 2191 reachable
    sssp_rows = sorted((n, r6(d)) for n, d in dist.items())
    oracles["graph_sssp"] = values_sql([("NodeId", "VARCHAR"), ("distance", "DOUBLE")], sssp_rows)

    # --- graph_sssp_slice: ordered by (distance, NodeId), slice [2181, 2191),
    # posexploded to scalar (pos, NodeId, distance) rows — the driver's
    # pandas canonicalizer cannot hash array columns (round-2 lesson).
    by_dist = sorted(((d, n) for n, d in dist.items()))
    window = by_dist[2181:2191]
    slice_rows = [(i, n, r6(d)) for i, (d, n) in enumerate(window)]
    oracles["graph_sssp_slice"] = values_sql(
        [("pos", "INTEGER"), ("NodeId", "VARCHAR"), ("distance", "DOUBLE")], slice_rows
    )

    # --- graph_dijkstra: streamed path (NodeId, cumulative cost)
    path = path_of(parent, SOURCE, TARGET)
    assert len(path) == 66
    cum, acc = [], 0.0
    for i, n in enumerate(path):
        if i:
            acc += min_cost(adj, path[i - 1], n)
        cum.append((n, r6(acc)))
    oracles["graph_dijkstra"] = values_sql([("NodeId", "VARCHAR"), ("cost", "DOUBLE")], cum)

    # --- graph_dijkstra_agg
    oracles["graph_dijkstra_agg"] = (
        f"{note}SELECT CAST(66 AS BIGINT) AS PathNodeNumber, CAST({repr(r6(dist[TARGET]))} AS DOUBLE) AS totalcost"
    )

    # --- graph_astar: same optimal path (admissible heuristic contract)
    oracles["graph_astar"] = values_sql([("NodeId", "VARCHAR"), ("cost", "DOUBLE")], cum)

    # --- graph_yens_k3 + postprocess
    paths = yen_k3(adj, SOURCE, TARGET, k=3)
    assert len(paths) == 3
    yrows = []
    pprows = []
    for idx, (total, p) in enumerate(paths):
        costs = [min_cost(adj, p[i], p[i + 1]) for i in range(len(p) - 1)]
        yrows.append((idx, len(p), r6(total)))
        pprows.append((idx, len(p), r6(math.fsum(costs)), r6(total), True))
    oracles["graph_yens_k3"] = values_sql(
        [("index", "INTEGER"), ("path_len", "BIGINT"), ("totalCost", "DOUBLE")], yrows
    )
    oracles["graph_yens_postprocess"] = values_sql(
        [
            ("index", "INTEGER"),
            ("n_places", "BIGINT"),
            ("reduce_total", "DOUBLE"),
            ("totalCost", "DOUBLE"),
            ("lengths_consistent", "BOOLEAN"),
        ],
        pprows,
    )

    # --- graph_writeback: all nodes, sssp distance or -1.0 sentinel
    wb = sorted((n, r6(dist[n]) if n in dist else -1.0) for n in node_ids)
    oracles["graph_writeback"] = values_sql([("NodeId", "VARCHAR"), ("sssp", "DOUBLE")], wb)

    # --- graph_apsp_top10: 10 longest finite shortest paths
    pairs = []
    for s in sorted(node_ids):
        ds, _p = dijkstra(adj, s)
        for t, d in ds.items():
            if t != s:
                pairs.append((d, s, t))
    pairs.sort(key=lambda x: (-x[0], x[1], x[2]))
    top = [(s, t, r6(d)) for d, s, t in pairs[:10]]
    oracles["graph_apsp_top10"] = values_sql(
        [("source", "VARCHAR"), ("target", "VARCHAR"), ("distance", "DOUBLE")], top
    )

    out = "/root/repo/bigdata_foundation_spark/graph_goldens.py"
    with open(out, "w") as f:
        f.write(
            '"""Pinned-golden DuckDB oracles for the graph queries.\n\n'
            "GENERATED by tools/gen_graph_goldens.py from an independent\n"
            "pure-Python Dijkstra/Yen/APSP over the reference's own\n"
            "Shenzhen_Edgelist_1.csv — NOT by the engine. Do not edit by\n"
            'hand; regenerate instead."""\n\n'
            "GOLDEN_SQL: dict[str, str] = {\n"
        )
        for k, v in oracles.items():
            f.write(f"    {k!r}: r'''{v}''',\n")
        f.write("}\n")
    print(f"wrote {out} with {len(oracles)} oracles")
    for k, v in oracles.items():
        print(f"  {k}: {len(v)} chars")


if __name__ == "__main__":
    main()
