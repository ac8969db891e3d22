"""Driver-local rows → DataFrame without a Python-RDD scan.

``spark.createDataFrame(list_of_rows, schema)`` plans as
``Scan ExistingRDD``: the rows live in a pickled Python RDD, so EVERY
execution of the query (and every broadcast build over it) spins up a
Python worker to re-evaluate them — measured ~0.4 s per execution for
a 400-row relation vs ~0.08 s as a JVM ``LocalTableScan``. For
driver-local metadata and collected results (rule tables, path rows,
top-k folds) the rows are already in driver memory, so shipping them
once as ONE Arrow batch and planning a ``LocalTableScan`` removes the
Python boundary from the execution path entirely (optimization guide
§4: the JVM↔Python crossing is the cost, and §6: Arrow for driver
transfers). Semantics are exact: ``None`` → NULL, ``float('nan')``
stays NaN, nested arrays/structs ride ``to_arrow_type``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DataType, StructType


def _as_struct(spark: SparkSession, schema) -> StructType:
    if isinstance(schema, StructType):
        return schema
    from pyspark.sql.types import _parse_datatype_string

    dt: DataType = _parse_datatype_string(schema)
    if not isinstance(dt, StructType):
        raise TypeError(f"schema must describe a struct, got {dt}")
    return dt


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for DRIVER-LOCAL row
    lists, planned as a JVM ``LocalTableScan`` (one Arrow batch at
    plan time, zero Python work at execution time) instead of a
    ``Scan ExistingRDD`` (one Python worker evaluation per execution).

    ``rows`` must be a list/tuple of row tuples (not an RDD — RDD
    input keeps the classic path by design, it is executor data).
    Falls back to the classic path for anything Arrow cannot express.
    """
    struct = _as_struct(spark, schema)
    rows = list(rows)
    # Shape guard (r15 advice): zip(*rows) silently TRUNCATES to the
    # shorter of row width vs field count, and transposes dict KEYS.
    # Any row that is not a width-matched tuple/list (Row is a tuple)
    # takes the classic path, which raises its standard mismatch error
    # or maps dict/Row fields by name — never silent data loss here.
    n_fields = len(struct.fields)
    if rows and any(
        not isinstance(r, (tuple, list)) or len(r) != n_fields for r in rows
    ):
        return spark.createDataFrame(rows, struct)
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_type

        cols = list(zip(*rows)) if rows else [[] for _ in struct.fields]
        arrays = [
            pa.array(list(col), type=to_arrow_type(f.dataType))
            for col, f in zip(cols, struct.fields)
        ]
        tbl = pa.table(dict(zip([f.name for f in struct.fields], arrays)))
        return spark.createDataFrame(tbl, schema=struct)
    except Exception:
        # exotic type or value Arrow refuses: the classic (verified,
        # Python-RDD) path is the correctness baseline
        return spark.createDataFrame(rows, struct)
