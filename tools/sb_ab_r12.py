"""r12 A/B: Stupid Backoff join-tail — string-keyed vs xxhash64-keyed
probe joins, at the generated sf1 decade (50k docs; the r11 verdict's
task-6 headroom question: sf1 grew 0.8→6.2 s for 10× docs).

One warm session, interleaved min-of-3 per arm, identical inputs.
Ship only a winner (the losing arm stays behind hashed_keys=False).

Usage:  python tools/sb_ab_r12.py
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from bigdata_foundation_spark.operators import text as TX
from bigdata_foundation_spark.session import get_spark
from tools.pipeline_sweep import make_sf1


def main() -> None:
    spark = get_spark(app_name="sb-ab-r12")
    sf1 = make_sf1(tempfile.mkdtemp(prefix="sb_ab_sf1_"))
    docs = spark.read.parquet(f"{sf1}/documents.parquet")
    if "--widevocab" in sys.argv:
        # The shipped synthetic corpus has a ~50-word vocabulary, so
        # every gram table broadcasts and the probe side never
        # shuffles — the regime a REAL web corpus is NOT in. Salt
        # each token with doc_id % 997 to blow the vocab up ~1000x:
        # the tri/bi tables then exceed the broadcast threshold and
        # the five joins run as shuffles (the regime the r11 sf1
        # tail question was actually about).
        salt = (F.col("doc_id") % 997).cast("string")
        docs = docs.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda t: F.concat(t, F.lit("_"), salt),
                ),
                " ",
            ),
        )
    docs.cache().count()
    train = docs.filter(F.col("lang") == "en")

    def run(hashed: bool) -> float:
        t0 = time.time()
        out = TX.stupid_backoff_score(docs, train, hashed_keys=hashed)
        n = out.count()
        dt = time.time() - t0
        print(f"  hashed={hashed}: {dt:.2f}s ({n} rows)", flush=True)
        return dt

    # warmup both arms once (JIT/codegen), then interleaved min-of-3
    print("warmup:")
    run(False)
    run(True)
    times = {False: [], True: []}
    for i in range(3):
        print(f"round {i + 1}:")
        for arm in (False, True):
            times[arm].append(run(arm))
    a, b = min(times[False]), min(times[True])
    print(f"\nmin-of-3  string-keyed: {a:.2f}s   hashed: {b:.2f}s   "
          f"ratio hashed/string = {b / a:.3f}")


if __name__ == "__main__":
    main()
