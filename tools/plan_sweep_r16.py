"""Per-line plan shape sweep (r16): for every HEADLINE query, count
Exchange / Python-eval / join-strategy / cartesian nodes in the
formatted physical plan. This is the 'examined' evidence behind
OPTIMIZATION_r16.md's per-line table.

Usage: python tools/plan_sweep_r16.py [out_json]
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import HEADLINE  # noqa: E402
from bigdata_foundation_spark.queries import registry  # noqa: E402
from bigdata_foundation_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

PATTERNS = {
    "exchange": r"\bExchange\b",
    "bhj": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "shj": r"ShuffledHashJoin",
    "cartesian": r"CartesianProduct|BroadcastNestedLoopJoin",
    "py_batch": r"BatchEvalPython",
    "py_arrow": r"ArrowEvalPython",
    "py_map": r"MapInPandas|MapInArrow|FlatMapGroupsInPandas",
    "existing_rdd": r"Scan ExistingRDD",
    "local_scan": r"LocalTableScan",
    "takeordered": r"TakeOrderedAndProject",
    "inmem": r"InMemoryTableScan",
    "scan_parquet": r"Scan parquet",
}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_sweep_r16.json"
    spark = get_spark(app_name="plan-sweep-r16", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    out: dict = {}
    for name in HEADLINE:
        try:
            df = reg[name].fn(spark, SF)
            plan = df._jdf.queryExecution().explainString(mode)
            out[name] = {k: len(re.findall(p, plan)) for k, p in PATTERNS.items()}
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {e}"}
        spark.catalog.clearCache()
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    # headline summary for the console
    cart = [n for n, d in out.items() if d.get("cartesian")]
    pyb = [n for n, d in out.items() if d.get("py_batch")]
    rdd = [n for n, d in out.items() if d.get("existing_rdd")]
    print(json.dumps({"n": len(out), "cartesian": cart, "batch_eval_python": pyb,
                      "existing_rdd": rdd,
                      "errors": [n for n, d in out.items() if "error" in d]}))
    spark.stop()


if __name__ == "__main__":
    main()
