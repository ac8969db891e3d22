"""Round-15 optimization-round pins.

Three internals changed for performance; these tests pin that the
VALUES are unchanged:

- ``_local.local_df`` plans driver-local rows as a JVM
  ``LocalTableScan`` with semantics identical to the classic
  ``createDataFrame(list)`` path (nulls, NaN, nested arrays, empty
  input, nullability);
- ``similarity._centroids_from``'s vectorized Lloyd loop is
  BIT-identical to the pure-Python fold replay it replaced;
- the streaming CDF diff's columnar row materialization yields the
  same tuples as the per-row-dict form;
- the hot plans that motivated the change no longer carry a
  Python-RDD scan.
"""

from __future__ import annotations

import math

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from bigdata_foundation_spark._local import local_df


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestLocalDf:
    def test_values_match_classic_path(self, spark):
        schema = T.StructType(
            [
                T.StructField("s", T.StringType()),
                T.StructField("n", T.LongType()),
                T.StructField("d", T.DoubleType()),
                T.StructField("arr", T.ArrayType(T.DoubleType())),
            ]
        )
        rows = [
            ("a", 1, 1.5, [1.0, 2.0]),
            (None, None, float("nan"), None),
            ("c", -3, math.inf, [float("nan")]),
        ]
        classic = spark.createDataFrame(rows, schema)
        arrow = local_df(spark, rows, schema)
        assert arrow.schema == classic.schema
        got = arrow.collect()
        want = classic.collect()
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g["s"] == w["s"] and g["n"] == w["n"]
            assert (g["d"] != g["d"]) == (w["d"] != w["d"])  # NaN parity
            if g["d"] == g["d"]:
                assert g["d"] == w["d"]
            assert (g["arr"] is None) == (w["arr"] is None)

    def test_plans_local_table_scan(self, spark):
        df = local_df(spark, [("x", 1)], "k string, v long")
        assert "LocalTableScan" in _plan(df)
        assert "ExistingRDD" not in _plan(df)

    def test_empty_rows(self, spark):
        sch = T.StructType([T.StructField("k", T.StringType(), False)])
        df = local_df(spark, [], sch)
        assert df.count() == 0
        assert df.schema == sch

    def test_nullability_preserved(self, spark):
        sch = T.StructType(
            [
                T.StructField("a", T.StringType(), False),
                T.StructField("b", T.DoubleType(), False),
            ]
        )
        assert local_df(spark, [("x", 1.0)], sch).schema == sch


class TestLloydBitIdentity:
    def test_centroids_match_pure_python_fold_replay(self, spark):
        """The vectorized Lloyd loop must reproduce the pure-Python
        left-to-right fold implementation bit-for-bit (the goldens
        were minted under that arithmetic)."""
        from bigdata_foundation_spark.operators.similarity import (
            _centroids_from,
            _py_fold_dot,
            _py_fold_norm,
        )

        # deterministic 40-vector corpus, dim 8, values that exercise
        # rounding (non-terminating binary fractions)
        rows = [
            (i, [((i * 7 + j * 13) % 97) / 7.0 - 5.0 for j in range(8)])
            for i in range(40)
        ]
        # one zero vector: exercises the invalid-denominator branch
        rows[5] = (5, [0.0] * 8)
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = _centroids_from(df, n_cells=4, id_col="vec_id", vec_col="embedding")

        # pure-Python replay of the pre-r15 loop over the same sample
        sample = (
            df.orderBy(F.xxhash64(F.col("vec_id")).asc(), F.col("vec_id").asc())
            .limit(4096)
            .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as _v")
            .collect()
        )
        seeds = sorted(sample[:4], key=lambda r: r["vec_id"])
        cents = [(i, list(r["_v"])) for i, r in enumerate(seeds)]
        dim = 8
        ordered = [list(r["_v"]) for r in sorted(sample, key=lambda r: r["vec_id"])]
        vnorms = [_py_fold_norm(v) for v in ordered]
        for _ in range(2):
            cnorms = [_py_fold_norm(cvec) for _, cvec in cents]
            sums, counts = {}, {}
            for v, vn in zip(ordered, vnorms):
                best = max(
                    (
                        (
                            vn * cn > 0.0,
                            _py_fold_dot(v, cvec) / (vn * cn) if vn * cn > 0.0 else 0.0,
                            cid,
                        )
                        for (cid, cvec), cn in zip(cents, cnorms)
                    )
                )[2]
                acc = sums.setdefault(best, [0.0] * dim)
                for i, x in enumerate(v):
                    acc[i] = acc[i] + x
                counts[best] = counts.get(best, 0) + 1
            cents = [
                (
                    cid,
                    [round(sums[cid][i] / counts[cid], 6) for i in range(dim)]
                    if cid in counts
                    else cvec,
                )
                for cid, cvec in cents
            ]
        assert got == cents  # exact, not approx: bit-identity contract


class TestCdfDiffColumnar:
    def test_row_tuples_match_per_row_dicts(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.table(
            {
                "k": pa.array([1, 2, None, 4], type=pa.int64()),
                "p": pa.array([1.5, None, 3.0, 4.25]),
                "s": pa.array(["a", None, "c", "d"]),
            }
        )
        p = str(tmp_path / "f.parquet")
        pq.write_table(tbl, p)
        names = ["k", "p", "s"]
        t = pq.read_table(p)
        via_dicts = [tuple(d[c] for c in names) for d in t.to_pylist()]
        via_zip = list(zip(*(t.column(c).to_pylist() for c in names)))
        assert via_zip == via_dicts
        assert set(via_zip) == set(via_dicts)


class TestNoPythonRddScanOnHotPlans:
    def test_dijkstra_result_is_local_table_scan(self, spark, graph1):
        from bigdata_foundation_spark.graph import dijkstra

        _nodes, roads = graph1
        df = dijkstra(spark, roads, "1", "2802")
        plan = _plan(df)
        assert "ExistingRDD" not in plan, plan

    def test_domain_lookup_rule_tables_are_local(self, spark):
        from bigdata_foundation_spark.operators.web import registered_domain_lookup

        urls = spark.range(1).selectExpr(
            "concat('https://a.example.com/', id) AS url"
        )
        plan = _plan(registered_domain_lookup(urls))
        assert "ExistingRDD" not in plan, plan
        assert "LocalTableScan" in plan
