"""bigdata_foundation_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of
the reference workload (redreddragon/bigdata-foundation): weighted-graph
ETL + shortest-path analytics (Dijkstra, delta-stepping SSSP, A*, Yen's
K-shortest-paths, APSP top-k), the relational/post-processing operators
its queries use, plus large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Everything is DataFrame-declarative so Catalyst/Tungsten pick the
physical strategy; iterative graph algorithms are a small BSP kernel
driven from the driver, with a broadcast-local exact kernel for graphs
that fit in one executor (the reference's own single-JVM execution
model, see SURVEY.md §4.2).
"""

__version__ = "0.1.0"
