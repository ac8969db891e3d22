"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``bigdata_foundation_spark.queries`` — this
module only adapts the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q1-shaped
    pricing summary — scan → pushed filter → partial agg → final agg."""
    from bigdata_foundation_spark.queries import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    north-star training-data pipeline operators."""
    from bigdata_foundation_spark.queries import registry

    return {name: spec.fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every query — either a direct ANSI-SQL
    re-derivation or a pinned-golden VALUES oracle minted by an
    independent pure-Python replay (tools/gen_graph_goldens.py,
    tools/gen_pipeline_goldens.py). The only omitted keys are the two
    approximate sketches (HLL / quantile digest), which get the
    driver's rows-only check plus pytest error-bound oracles."""
    from bigdata_foundation_spark.queries import registry

    return {name: spec.oracle for name, spec in registry().items() if spec.oracle is not None}
