"""Cache hygiene for operator-internal ``.cache()`` calls.

Several operators cache an intermediate that multiple branches of the
same query plan read (LSH signature tables, shingle-hash tables, IVF
probe assignments). Those caches are load-bearing *within* one query,
but a long-lived session that runs many such queries accumulates
cached storage the caller never sees (round-3 advice).

The operators register every such cache here; callers that run many
queries in one session can reclaim all of it at natural boundaries:

    from bigdata_foundation_spark.operators import release_operator_caches
    release_operator_caches()

(``spark.catalog.clearCache()`` also works but is a blunt hammer —
it drops caches the *caller* created too.) The registry holds weak
references, so dataframes that go out of scope don't pile up here.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_CACHED: "weakref.WeakSet[DataFrame]" = weakref.WeakSet()


def tracked_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register for :func:`release_operator_caches`."""
    df.cache()
    _CACHED.add(df)
    return df


def release_operator_caches() -> int:
    """Unpersist every operator-internal cache still alive; returns the
    number released. Safe to call at any time — a query that is still
    running simply recomputes (correctness is unaffected)."""
    n = 0
    for df in list(_CACHED):
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session may be gone
            pass
        _CACHED.discard(df)
    return n
