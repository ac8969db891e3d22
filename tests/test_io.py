"""Source/sink roundtrips: csv/json/parquet + partitioned writes with
partition pruning on read-back."""

import pytest
from pyspark.sql import functions as F

from bigdata_foundation_spark import io as eio


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [(1, "a", "x", 1.5), (2, "b", "y", 2.5), (3, "a", "z", 3.5)],
        "id long, part string, name string, v double",
    )


def test_parquet_roundtrip_partitioned(spark, sample, tmp_path):
    path = str(tmp_path / "t")
    eio.write_parquet(sample, path, partition_by=["part"])
    back = eio.read_parquet(spark, path)
    assert back.count() == 3
    # partition pruning must reach the scan
    pruned = back.filter(F.col("part") == "a")
    assert pruned.count() == 2
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(part" in plan


def test_csv_roundtrip(spark, sample, tmp_path):
    path = str(tmp_path / "c")
    eio.write_csv(sample, path)
    back = eio.read_csv(spark, path, schema=sample.schema)
    assert sorted(r["name"] for r in back.collect()) == ["x", "y", "z"]


def test_json_roundtrip(spark, sample, tmp_path):
    path = str(tmp_path / "j")
    eio.write_json(sample, path)
    back = eio.read_json(spark, path, schema=sample.schema)
    assert back.count() == 3
    assert {r["id"] for r in back.collect()} == {1, 2, 3}


def test_truncate(spark, sample):
    from bigdata_foundation_spark.graph.etl import truncate

    t = truncate(sample)
    assert t.count() == 0 and t.schema == sample.schema

def test_orc_roundtrip(spark, sample, tmp_path):
    path = str(tmp_path / "orc_t")
    eio.write_orc(sample, path)
    back = eio.read_orc(spark, path)
    assert sorted(r["id"] for r in back.collect()) == [1, 2, 3]
    # predicate pushdown reaches the ORC scan too
    plan = back.filter(F.col("id") == 2)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), EqualTo(id,2)]" in plan


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must join with zero
    Exchange — the paid-once-shuffle contract of write_bucketed."""
    a = spark.range(1000).withColumn("v", F.col("id") * 2)
    b = spark.range(1000).withColumn("w", F.col("id") % 7)
    eio.write_bucketed(a, "bk_a", ["id"], n_buckets=8, sort_by=["id"])
    eio.write_bucketed(b, "bk_b", ["id"], n_buckets=8, sort_by=["id"])
    try:
        # Disable broadcast so the planner would otherwise shuffle.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bk_a").join(spark.table("bk_b"), "id")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_compact(spark, tmp_path):
    path = str(tmp_path / "frag")
    # 40 tiny files
    spark.range(40000).withColumn("v", F.col("id") % 97).repartition(40).write.parquet(path)
    import os
    n_before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_before >= 40
    eio.compact(spark, path, target_file_mb=512, sort_within_by=["id"])
    n_after = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    back = spark.read.parquet(path)
    assert back.count() == 40000
    assert n_after < n_before and n_after <= 2


def test_write_zordered_clusters_both_dims(spark, tmp_path):
    """Z-order sink: every output file must cover a narrow range of
    EVERY z-order column (measured ~0.25 of the global range per dim
    on 16 files at sf0.01) — a single-column sort can only achieve
    this for its leading column; 1.0 means no clustering. Roundtrip
    is lossless and schema-stable, and the helper columns never leak
    into the files."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    import bigdata_foundation_spark.io as eio

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    out = str(tmp_path / "zo")
    eio.write_zordered(ev, out, ["user_id", "value"], n_files=16)
    back = spark.read.parquet(out)
    assert back.columns == ev.columns
    assert back.count() == ev.count()
    assert back.selectExpr("sum(hash(event_id))").first()[0] == ev.selectExpr(
        "sum(hash(event_id))"
    ).first()[0]

    glo = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    span_u, span_v, n = 0.0, 0.0, 0
    for f in glob.glob(out + "/*.parquet"):
        t = pq.read_table(f, columns=["user_id", "value"])
        u, v = t.column("user_id").to_pylist(), t.column("value").to_pylist()
        if not u:
            continue
        span_u += (max(u) - min(u)) / float(glo[1] - glo[0])
        span_v += (max(v) - min(v)) / float(glo[3] - glo[2])
        n += 1
    assert n >= 8
    assert span_u / n < 0.5 and span_v / n < 0.5, (span_u / n, span_v / n)


def test_zorder_key_rejects_bit_overflow(spark, tmp_path):
    """ADVICE r5: JVM shiftleft wraps its shift amount mod 64, so an
    interleave past 63 bits silently folds high bits onto low positions
    and corrupts the Morton ordering. zorder_key must raise;
    write_zordered must auto-reduce bits and still produce a correct
    clustered write."""
    from pyspark.sql import functions as F

    import bigdata_foundation_spark.io as eio

    cols = [(F.col(f"c{i}"), F.lit(0.0), F.lit(1.0)) for i in range(6)]
    with pytest.raises(ValueError, match="63 value bits"):
        eio.zorder_key(cols, bits=12)  # 72 bits > 63

    df = spark.range(512).select(
        "id", *[(F.col("id") * (i + 1) % 97).cast("double").alias(f"c{i}") for i in range(6)]
    )
    out = str(tmp_path / "zo6")
    eio.write_zordered(df, out, [f"c{i}" for i in range(6)], n_files=4, bits=12)
    back = spark.read.parquet(out)
    assert back.count() == 512
    assert sorted(back.columns) == sorted(df.columns)


def test_bsp_superstep_bucketed_edges_no_shuffle(spark, csv1):
    """r5 verdict task 3: the bucketed-edge claim in graph/bsp.py must
    be code + a plan pin, not a docstring. With
    load_graph(..., bucketed=True), one BSP superstep's plan — the
    min-cost kernel pre-aggregation feeding frontier ⋈ edges — must
    contain EXACTLY ONE Exchange, and it must be on the frontier side:
    the bucketed scan's hash-partitioning on src satisfies both the
    (src, dst) aggregate and the join, so the edge side never
    shuffles, every superstep, forever."""
    from bigdata_foundation_spark.graph import load_graph

    nodes, roads = load_graph(
        spark, csv1, bucketed=True, bucket_table="bk_roads_test", n_buckets=8
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        edges = roads.groupBy("src", "dst").agg(F.min("cost").alias("cost"))
        frontier = spark.createDataFrame(
            [("2022", 0.0, ["2022"])], "node string, dist double, path array<string>"
        )
        cand = frontier.alias("f").join(
            edges.alias("e"), F.col("f.node") == F.col("e.src")
        )
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        assert "Bucketed: true" in plan, plan
        # the single Exchange partitions the frontier's `node`, not the
        # edge table's `src`
        exch_line = next(l for l in plan.splitlines() if "Exchange" in l)
        assert "node#" in exch_line, exch_line

        # and the bucketed read is semantically identical to the plain
        # roads table
        _n2, plain = load_graph(spark, csv1)
        assert roads.count() == plain.count()
        assert (
            roads.selectExpr("sum(hash(src, dst, road_id, cost))").first()[0]
            == plain.selectExpr("sum(hash(src, dst, road_id, cost))").first()[0]
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_roads_test")
        nodes.unpersist()
