"""Weighted-digraph ETL and path-algorithm operators."""

from bigdata_foundation_spark.graph.etl import build_edges, build_nodes, load_graph, read_edgelist
from bigdata_foundation_spark.graph.paths import apsp_topk, astar, dijkstra, sssp, yens_k

__all__ = [
    "read_edgelist",
    "build_nodes",
    "build_edges",
    "load_graph",
    "sssp",
    "dijkstra",
    "astar",
    "yens_k",
    "apsp_topk",
]
