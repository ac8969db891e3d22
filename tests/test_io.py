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