"""r13 task-2 adjudication: same-boot interleaved min-of-3 of the
three SAME-CODE graph lines whose single BENCH_r12 draw exceeded 1.9x
vs r11 (graph_hyperball_70k 2.51x, graph_dijkstra_70k 2.20x,
graph_ktruss_70k 1.96x — graph/etl.py untouched in r12, dijkstra
deliberately not file-tiered), with ALL THREE calibration probes
recorded. The regime is bench.py's graph block exactly: one
load_graph + build_projection (amortized projection, the reference's
own GDS regime), then interleaved passes each triggered by a noop
write.

    python tools/adjudicate_r13.py

Paste the row into CALIBRATION.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

GRAPH_CSV = "/root/reference/Shenzhen_Edgelist_7.csv"
GRAPH_SOURCE, GRAPH_TARGET = "2022", "1319"

R11 = {
    "graph_hyperball_70k": 1.764,
    "graph_dijkstra_70k": 0.498,
    "graph_ktruss_70k": 0.400,
    "jvm_cpu_sec": 0.423,
    "shuffle_sec": 1.897,
    "fixed_overhead_sec": 0.1511,
}
R12 = {
    "graph_hyperball_70k": 4.429,
    "graph_dijkstra_70k": 1.097,
    "graph_ktruss_70k": 0.784,
    "jvm_cpu_sec": 0.460,
    "shuffle_sec": 1.966,
    "fixed_overhead_sec": 0.1462,
}


def main() -> int:
    from bigdata_foundation_spark.graph import dijkstra, load_graph
    from bigdata_foundation_spark.graph.etl import hyperball, truss_decomposition
    from bigdata_foundation_spark.graph.paths import build_projection
    from bigdata_foundation_spark.session import get_spark

    spark = get_spark(app_name="adjudicate-r13")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup (bench.py's)
    spark.range(1000).selectExpr("sum(id)").collect()

    # calibration probes — identical to bench.py
    t0 = time.time()
    spark.range(0, 200_000_000, 1, 32).selectExpr("sum(id * 3 + 7)").collect()
    jvm_cpu = round(time.time() - t0, 3)
    t0 = time.time()
    (
        spark.range(0, 4_000_000, 1, 32)
        .selectExpr("id % 100000 AS k", "id AS v")
        .groupBy("k")
        .sum("v")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    shuffle = round(time.time() - t0, 3)
    fixed = []
    for _ in range(5):
        t0 = time.time()
        spark.range(1).count()
        fixed.append(time.time() - t0)
    fixed_overhead = round(min(fixed), 4)
    print(
        f"calibration: jvm_cpu {jvm_cpu}s shuffle {shuffle}s fixed {fixed_overhead}s"
    )
    print(
        f"  vs r11 draw: jvm x{jvm_cpu / R11['jvm_cpu_sec']:.2f} "
        f"shuffle x{shuffle / R11['shuffle_sec']:.2f} "
        f"fixed x{fixed_overhead / R11['fixed_overhead_sec']:.2f}"
    )

    nodes, roads = load_graph(spark, GRAPH_CSV)
    n_nodes, n_roads = nodes.count(), roads.count()
    assert (n_nodes, n_roads) == (25341, 69070), (n_nodes, n_roads)
    proj = build_projection(roads, nodes)

    lines = [
        (
            "graph_dijkstra_70k",
            lambda: dijkstra(spark, roads, GRAPH_SOURCE, GRAPH_TARGET, projection=proj),
        ),
        ("graph_hyperball_70k", lambda: hyperball(roads, t_max=8, m=64, projection=proj)),
        ("graph_ktruss_70k", lambda: truss_decomposition(roads, projection=proj)),
    ]

    best: dict[str, float] = {}
    for pass_i in range(3):
        print(f"pass {pass_i + 1}:")
        for name, fn in lines:
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best[name] = round(min(best.get(name, dt), dt), 3)
            print(f"  {name}: {dt:.3f}s", flush=True)

    calib = max(
        jvm_cpu / R11["jvm_cpu_sec"],
        shuffle / R11["shuffle_sec"],
        fixed_overhead / R11["fixed_overhead_sec"],
    )
    print(f"\nmin-of-3 vs r11/r12 (worst calibration factor this boot vs r11: x{calib:.2f}):")
    for name, _ in lines:
        ratio = best[name] / R11[name]
        verdict = "INSIDE calibration" if ratio <= calib * 1.05 else "OVER calibration"
        print(
            f"  {name}: r11 {R11[name]:.3f}  r12-draw {R12[name]:.3f}  "
            f"now {best[name]:.3f} (x{ratio:.2f} vs r11) -> {verdict}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
