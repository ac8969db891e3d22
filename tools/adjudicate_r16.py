"""Matched-probe min-of-N adjudication of the three r15 perf-weak
lines (VERDICT r15 task 1): streaming_source_tail, graph_yens_k3_70k,
graph_apsp_top10_70k.

Method: same session, same noop-sink timing as bench.py, interleaved
min-of-N (N=5), calibration probes before and after so every number
has a host-speed reference. Also phase-profiles streaming_source_tail
(commits vs stream vs agg) and apsp (hub SSSPs vs waves) so a real
regression is attributable, not just detected.

Usage: python tools/adjudicate_r16.py [N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
GRAPH_CSV = "/root/reference/Shenzhen_Edgelist_7.csv"
SRC, DST = "2022", "1319"


def calib(spark):
    t0 = time.time()
    spark.range(0, 200_000_000, 1, 32).selectExpr("sum(id * 3 + 7)").collect()
    jvm = time.time() - t0
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
    sh = time.time() - t0
    fixed = []
    for _ in range(5):
        t0 = time.time()
        spark.range(1).count()
        fixed.append(time.time() - t0)
    return {"jvm": round(jvm, 3), "shuffle": round(sh, 3), "fixed": round(min(fixed), 4)}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from bigdata_foundation_spark.graph import apsp_topk, load_graph, yens_k
    from bigdata_foundation_spark.graph.paths import build_projection
    from bigdata_foundation_spark.queries import registry
    from bigdata_foundation_spark.session import get_spark

    spark = get_spark(app_name="adjudicate-r16")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    c0 = calib(spark)
    nodes, roads = load_graph(spark, GRAPH_CSV)
    nodes.count(), roads.count()
    proj = build_projection(roads, nodes)

    runs = {"streaming_source_tail": [], "graph_yens_k3_70k": [], "graph_apsp_top10_70k": []}
    for i in range(n):
        spark.sparkContext.setJobDescription(f"adj tail #{i}")
        t0 = time.time()
        noop(reg["streaming_source_tail"].fn(spark, SF_DIR))
        runs["streaming_source_tail"].append(round(time.time() - t0, 3))
        spark.catalog.clearCache()

        spark.sparkContext.setJobDescription(f"adj yens #{i}")
        t0 = time.time()
        noop(yens_k(spark, roads, SRC, DST, k=3, projection=proj))
        runs["graph_yens_k3_70k"].append(round(time.time() - t0, 3))

        spark.sparkContext.setJobDescription(f"adj apsp #{i}")
        t0 = time.time()
        noop(apsp_topk(spark, roads, k=10, projection=proj))
        runs["graph_apsp_top10_70k"].append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)

    # phase profile: streaming_source_tail decomposed
    import tempfile

    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.source import register_snapshot_source
    from pyspark.sql import functions as F

    register_snapshot_source(spark)
    phases = {}
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    t0 = time.time()
    tdir = tempfile.mkdtemp(prefix="adj_tail_")
    bio.write_snapshot(orders.filter(k % 3 == 0).coalesce(1), tdir, mode="overwrite", commit_id="t1")
    bio.write_snapshot(orders.filter(k % 3 == 1).coalesce(1), tdir, mode="append", commit_id="t2")
    bio.write_snapshot(orders.filter(k % 3 == 2).coalesce(1), tdir, mode="append", commit_id="t3")
    phases["commits"] = round(time.time() - t0, 3)
    out = tempfile.mkdtemp(prefix="adj_tail_out_") + "/rows"
    ckpt = tempfile.mkdtemp(prefix="adj_tail_ckpt_")
    t0 = time.time()
    q_ = (
        spark.readStream.format("snapshot_table")
        .option("path", tdir)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q_.awaitTermination()
    phases["stream"] = round(time.time() - t0, 3)
    prog = q_.lastProgress
    if prog:
        phases["triggerExecution_ms"] = prog["durationMs"].get("triggerExecution")
        phases["addBatch_ms"] = prog["durationMs"].get("addBatch")
    t0 = time.time()
    noop(
        spark.read.parquet(out)
        .groupBy((k % 6).cast("bigint").alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )
    phases["agg"] = round(time.time() - t0, 3)

    c1 = calib(spark)
    print(json.dumps({"n": n, "calib_before": c0, "calib_after": c1, "runs": runs,
                      "mins": {q: min(v) for q, v in runs.items()},
                      "tail_phases": phases}))
    spark.stop()


if __name__ == "__main__":
    main()
