"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and, where an oracle exists,
compares row count, column names, and order-insensitive values against
DuckDB. Exit code 1 on any mismatch. Usage:

    python tools/check_oracles.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bigdata_foundation_spark.io import TESTDATA_TABLES
from bigdata_foundation_spark.queries import registry
from bigdata_foundation_spark.session import get_spark


def _norm_val(v):
    if hasattr(v, "tolist"):  # numpy array / scalar from DuckDB .df()
        v = v.tolist()
    if isinstance(v, list):
        return str([_norm_val(x) for x in v])
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else str(round(v, 6))
    return str(v)


def normalize(rows, cols):
    out = [tuple(_norm_val(row[c]) for c in cols) for row in rows]
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark(app_name="oracle-check", master="local[8]")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    matched = 0
    for name, spec in registry().items():
        import re

        if name_filter and not re.search(name_filter, name):
            continue
        matched += 1
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if spec.oracle is None:
            print(f"ok   {name}: {len(srows)} rows [rows-only] ({dt:.1f}s)")
            continue
        if "sf0.01" not in sf_dir and "pinned golden" in spec.oracle:
            # pinned-golden VALUES encode the sf0.01 answers; at any
            # other scale they would "fail" by design. The cross-scale
            # sweep (r5: caught q9's decimal-vs-double cent-rounding
            # divergence at sf0.001) covers the SQL-oracled subset.
            print(f"ok   {name}: {len(srows)} rows [pinned@sf0.01, skipped at this sf]")
            continue
        try:
            ddf = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dcols = list(ddf.columns)
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns differ spark={sorted(scols)} duck={sorted(dcols)}")
            failures += 1
            continue
        if len(srows) != len(ddf):
            print(f"FAIL {name}: rows differ spark={len(srows)} duck={len(ddf)}")
            failures += 1
            continue
        cols = sorted(scols)
        s_norm = normalize(srows, cols)
        d_norm = normalize(ddf.to_dict("records"), cols)
        if s_norm != d_norm:
            diff = [i for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b][:3]
            print(f"FAIL {name}: values differ at sorted rows {diff}")
            for i in diff:
                print(f"    spark: {s_norm[i]}\n    duck : {d_norm[i]}")
            failures += 1
            continue
        print(f"OK   {name}: {len(srows)} rows value-match ({dt:.1f}s)")

    if name_filter and matched == 0:
        # A filter that selects NOTHING must not "pass" (r14 incident:
        # `--only foo` parsed as a no-match regex and the empty run
        # printed ALL OK, masking a real divergence until the full
        # registry run caught it). Vacuous filters exit nonzero.
        print(
            f"FAIL: name filter {name_filter!r} matched 0 of "
            f"{len(registry())} registry entries"
        )
        return 1
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
