"""Capture .explain('formatted') for named registry queries into
plans/r16/<query>_<tag>.txt (r16 optimization-round evidence).

Usage: python tools/capture_plans_r16.py <before|after> <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bigdata_foundation_spark.queries import registry  # noqa: E402
from bigdata_foundation_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="capture-plans-r16")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    for name in names:
        df = reg[name].fn(spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
