"""Phase breakdown of the top bench lines (r15 optimization round).

Times each phase of the heaviest queries separately so the
optimization targets the real cost, not the guess. Run on a quiet
machine:  python tools/phase_probe_r15.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from bigdata_foundation_spark.queries import registry  # noqa: E402
from bigdata_foundation_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"  {time.time() - t0:7.3f}s  {label}", flush=True)
    return out


def main():
    spark = get_spark(app_name="phase-probe-r15")
    spark.sparkContext.setLogLevel("ERROR")
    # warm
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF}/region.parquet").count()

    from bigdata_foundation_spark import io as bio
    from bigdata_foundation_spark.streaming.source import register_snapshot_source

    print("== streaming_change_feed phases ==", flush=True)
    for rep in range(2):
        register_snapshot_source(spark)
        orders = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p"))
        )
        k = F.col("k")
        tdir = tempfile.mkdtemp(prefix="probe_cdf_")
        v1 = t("write_snapshot overwrite (8 range files)", lambda: bio.write_snapshot(
            orders.repartitionByRange(8, k), tdir, mode="overwrite", commit_id="c1"))
        updates = (
            orders.filter(k % 30 == 0)
            .withColumn("p", F.col("p") + 700.0)
            .unionByName(
                orders.filter(k % 150 == 0).select(
                    (k + 400000000).alias("k"), F.lit(1.0).alias("p"))
            )
        )
        t("snapshot_merge", lambda: bio.snapshot_merge(spark, tdir, updates, ["k"], commit_id="c2"))
        t("snapshot_delete", lambda: bio.snapshot_delete(
            spark, tdir, F.col("p") > 450000.0, prune=[("p", 450000.0, None)], commit_id="c3"))
        out = tempfile.mkdtemp(prefix="probe_cdf_out_") + "/rows"
        ckpt = tempfile.mkdtemp(prefix="probe_cdf_ckpt_")

        def stream():
            q_ = (
                spark.readStream.format("snapshot_table")
                .option("path", tdir)
                .option("readChangeFeed", "true")
                .option("keyCols", "k")
                .option("startingVersion", str(v1 + 1))
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q_.awaitTermination()

        t("stream readChangeFeed -> parquet sink", stream)
        t("final read+agg (noop)", lambda: (
            spark.read.parquet(out)
            .groupBy(F.col("_commit_version").cast("int").alias("commit_version"),
                     F.col("_change_type").alias("change_type"))
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.round(F.sum("p"), 2).alias("total"))
            .write.format("noop").mode("overwrite").save()))
        spark.catalog.clearCache()
        print(f"  -- rep {rep} done --", flush=True)

    print("== streaming_source_tail phases ==", flush=True)
    for rep in range(2):
        orders2 = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey", "o_totalprice")
        kk = F.col("o_orderkey")
        tdir = tempfile.mkdtemp(prefix="probe_tail_")
        t("3 commits", lambda: [
            bio.write_snapshot(orders2.filter(kk % 3 == 0).coalesce(1), tdir, mode="overwrite", commit_id="t1"),
            bio.write_snapshot(orders2.filter(kk % 3 == 1).coalesce(1), tdir, mode="append", commit_id="t2"),
            bio.write_snapshot(orders2.filter(kk % 3 == 2).coalesce(1), tdir, mode="append", commit_id="t3"),
        ])
        out = tempfile.mkdtemp(prefix="probe_tail_out_") + "/rows"
        ckpt = tempfile.mkdtemp(prefix="probe_tail_ckpt_")

        def stream2():
            q_ = (
                spark.readStream.format("snapshot_table")
                .option("path", tdir).load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q_.awaitTermination()

        t("stream tail -> parquet sink", stream2)
        t("final read+agg (noop)", lambda: (
            spark.read.parquet(out)
            .groupBy((kk % 6).cast("bigint").alias("bucket"))
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .write.format("noop").mode("overwrite").save()))
        spark.catalog.clearCache()
        print(f"  -- rep {rep} done --", flush=True)

    # isolate the CDF diff task cost: how long does _read_cdf_diff's
    # row materialization take on the merge commit's file set?
    print("== CDF diff kernel micro ==", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
