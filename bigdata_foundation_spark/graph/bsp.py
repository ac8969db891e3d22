"""Distributed BSP shortest-path kernel (whole-frontier relaxation).

The scale path for graphs that do NOT fit in one executor's memory:
state is a DataFrame ``(node, dist, path)`` advanced by joining the
improvement frontier against the edge table each superstep —
effectively delta-stepping where the bucket is "the whole frontier"
(the reference's ``delta`` knob, neo4j-code.txt:51, is a scheduling
detail with no effect on results; SURVEY.md §2.2 G2).

Scale design decisions (SURVEY.md §4.3 hard-parts list):

* **Lineage discipline** — ``localCheckpoint(eager=True)`` on every
  superstep's improvement frontier truncates the iterated-join plan;
  without it the Catalyst plan doubles per iteration.
* **Convergence without extra actions** — the frontier is checkpointed
  then counted; the same materialized result feeds the next join, so
  each superstep is exactly one job.
* **Multigraph handling** — parallel edges are pre-aggregated to
  ``min(cost)`` per (src, dst) *inside the kernel projection only*
  (storage keeps the multigraph, per operator I6): distances are
  unaffected and the join fan-out halves.
* **Goal-directed pruning (A*/early stop)** — candidates with
  ``dist + h(node) >= best-known target distance`` are dropped, the
  BSP analog of A*'s OPEN-list pruning / Dijkstra's settled-target
  early exit. h is a column expression (Euclidean on planar coords),
  evaluated JVM-side.

On a real cluster the edge table would be pre-partitioned by ``src``
(bucketed) so every superstep's join is shuffle-free on the edge side;
locally AQE handles it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("node", T.StringType(), False),
        T.StructField("dist", T.DoubleType(), False),
        T.StructField("path", T.ArrayType(T.StringType()), False),
    ]
)


def bsp_sssp(
    spark: SparkSession,
    roads: DataFrame,
    source: str,
    target: str | None = None,
    nodes: DataFrame | None = None,
    use_heuristic: bool = False,
    max_supersteps: int = 10_000,
    checkpoint_state_every: int = 8,
) -> DataFrame:
    """Single-source shortest distances (and paths) by BSP relaxation.

    Returns a DataFrame ``(node, dist, path)`` with one row per
    reachable node (all nodes for SSSP; pruned search space when
    ``target`` is given). ``use_heuristic`` additionally prunes by the
    admissible Euclidean heuristic (requires ``nodes`` with
    XCoord/YCoord) — the A* variant.
    """
    # Kernel projection: min-cost per (src, dst). Column-pruned and
    # cached — the analog of GDS's relationshipProjection
    # (neo4j-code.txt:3–15).
    edges = (
        roads.groupBy("src", "dst").agg(F.min("cost").alias("cost"))
    )
    if use_heuristic:
        if nodes is None or target is None:
            raise ValueError("A* pruning needs `nodes` coordinates and a target")
        trow = nodes.filter(F.col("NodeId") == target).select("XCoord", "YCoord").head()
        if trow is None:
            raise ValueError(f"target node {target!r} not found")
        tx, ty = float(trow[0]), float(trow[1])
        # h(dst) attached to every edge once, JVM-side arithmetic only.
        edges = edges.join(
            F.broadcast(nodes.select(F.col("NodeId").alias("dst"), "XCoord", "YCoord")), "dst"
        ).withColumn(
            "h",
            F.sqrt(
                (F.col("XCoord") - F.lit(tx)) ** 2 + (F.col("YCoord") - F.lit(ty)) ** 2
            ),
        ).select("src", "dst", "cost", "h")
    else:
        edges = edges.withColumn("h", F.lit(0.0))
    edges = edges.cache()
    edges.count()  # materialize the projection once

    state = spark.createDataFrame([(source, 0.0, [source])], _STATE_SCHEMA).localCheckpoint(eager=True)
    frontier = state
    best_target = float("inf")

    for step in range(1, max_supersteps + 1):
        cand = (
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.node") == F.col("e.src"))
            .select(
                F.col("e.dst").alias("node"),
                (F.col("f.dist") + F.col("e.cost")).alias("dist"),
                F.concat(F.col("f.path"), F.array(F.col("e.dst"))).alias("path"),
                F.col("e.h").alias("h"),
            )
        )
        if target is not None and best_target < float("inf"):
            # Goal-directed pruning: a candidate whose admissible lower
            # bound already exceeds the best known target distance can
            # never improve the answer.
            cand = cand.filter(F.col("dist") + F.col("h") < F.lit(best_target))

        best_cand = (
            cand.groupBy("node")
            .agg(F.min(F.struct("dist", "path")).alias("m"))
            .select("node", F.col("m.dist").alias("dist"), F.col("m.path").alias("path"))
        )
        improved = (
            best_cand.alias("c")
            .join(state.alias("s"), "node", "left")
            .filter(F.col("s.dist").isNull() | (F.col("c.dist") < F.col("s.dist")))
            .select("node", F.col("c.dist").alias("dist"), F.col("c.path").alias("path"))
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break

        state = state.alias("s").join(improved.alias("i"), "node", "left_anti").unionByName(improved)
        if step % checkpoint_state_every == 0:
            state = state.localCheckpoint(eager=True)
        frontier = improved

        if target is not None:
            trow = improved.filter(F.col("node") == target).select("dist").head()
            if trow is not None:
                best_target = min(best_target, float(trow[0]))

    edges.unpersist()
    return state


# NOTE nullable=True throughout: declaring these non-nullable trips a
# Spark 4.1 optimizer NoSuchElementException ("key not found: source#N")
# when the anti-join ∪ union state plan is localCheckpoint'd — the
# nullability-propagation rule loses the attribute. Values are never
# actually null.
_MULTI_STATE_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), True),
        T.StructField("node", T.StringType(), True),
        T.StructField("dist", T.DoubleType(), True),
    ]
)


def bsp_multi_sssp(
    spark: SparkSession,
    roads: DataFrame,
    sources: list[str],
    max_supersteps: int = 10_000,
    checkpoint_state_every: int = 8,
    edges_pre_aggregated: DataFrame | None = None,
) -> DataFrame:
    """Distance-only SSSP from MANY sources in one BSP run: state is
    ``(source, node, dist)`` keyed by source, so every superstep
    relaxes all sources' frontiers in the same join — the wave-batched
    G3 kernel for graphs past the broadcast limit. Memory per wave is
    |sources| × |reachable| rows, which the caller bounds by batching
    sources into waves (SURVEY.md §4.3 hard-part 5).

    Paths are not carried (the APSP post-pipeline needs distances
    only), so the shuffled state row is 3 narrow columns.

    ``edges_pre_aggregated`` lets the caller pass an already-cached
    min-cost (src, dst, cost) projection shared across waves.
    """
    if edges_pre_aggregated is not None:
        edges = edges_pre_aggregated
    else:
        edges = (
            roads.groupBy("src", "dst").agg(F.min("cost").alias("cost")).cache()
        )
        edges.count()
    e = edges.select(
        F.col("src").alias("_u"), F.col("dst").alias("_v"), F.col("cost").alias("_w")
    )

    state = spark.createDataFrame(
        [(s, s, 0.0) for s in sources], _MULTI_STATE_SCHEMA
    ).localCheckpoint(eager=True)
    frontier = state

    for step in range(1, max_supersteps + 1):
        cand = (
            frontier.alias("f")
            .join(e.alias("e2"), F.col("f.node") == F.col("e2._u"))
            .select(
                F.col("f.source").alias("source"),
                F.col("e2._v").alias("node"),
                (F.col("f.dist") + F.col("e2._w")).alias("dist"),
            )
        )
        best_cand = cand.groupBy("source", "node").agg(F.min("dist").alias("dist"))
        on = (F.col("c.source") == F.col("s.source")) & (F.col("c.node") == F.col("s.node"))
        improved = (
            best_cand.alias("c")
            .join(state.alias("s"), on, "left")
            .filter(F.col("s.dist").isNull() | (F.col("c.dist") < F.col("s.dist")))
            .select(
                F.col("c.source").alias("source"),
                F.col("c.node").alias("node"),
                F.col("c.dist").alias("dist"),
            )
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        anti = (F.col("s.source") == F.col("i.source")) & (F.col("s.node") == F.col("i.node"))
        state = (
            state.alias("s")
            .join(improved.alias("i"), anti, "left_anti")
            .unionByName(improved)
        )
        if step % checkpoint_state_every == 0:
            state = state.localCheckpoint(eager=True)
        frontier = improved

    if edges_pre_aggregated is None:
        edges.unpersist()
    return state
