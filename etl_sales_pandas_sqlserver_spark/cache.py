"""Construction-time hygiene for query-local DataFrame caches.

Several queries cache a small intermediate frame that is consumed more
than once inside their own plan (the dedup shingle frame, the ANN
contract's exact top-k set, the bloom bitmap). The cache must survive
the query's execution -- so the query cannot unpersist it itself -- but
without any release it outlives the query: a driver correctness sweep
or a test session that constructs-and-collects a hundred queries in one
SparkSession accumulates every one of those caches (round-5 advice;
only bench.py's ``clearCache`` between runs covered this).

``managed_cache`` is the shared fix: it releases every cache registered
by PREVIOUS queries, then caches and registers the new frame(s). Since
the driver, bench, and tests all construct queries serially
(construct -> execute -> construct ...), by the time the next
cache-creating query is constructed the prior query's execution is
over and its cache is dead weight.

A query that needs SEVERAL caches must register them in one call
(``managed_cache(a, b)``) or pass ``extend=True`` on later calls --
a plain second call releases the first (round-7 advice: a composite
plan built from two cache-using sub-queries would otherwise silently
lose the first sub-query's cache at construction time and recompute
it at execution).
If an already-constructed query is re-executed after another query was
constructed, it simply recomputes without the cache: correctness never
depends on a cache being present. Code whose RESULT validity depends
on a live cache (e.g. corrupt-record-column scans) must NOT register
here -- materialize via localCheckpoint instead (see
sources/csv_folder.read_csv_with_bad_records).
"""

from __future__ import annotations

import weakref
from typing import Callable, Hashable

from pyspark.sql import DataFrame

_ACTIVE: list[DataFrame] = []

# ---------------------------------------------------------------------------
# Session-scoped eager-checkpoint memo (round 7): several query
# families re-derive the same expensive intermediate in every query of
# a serial sweep (the LSH-verified pair list; the synthetic sales_raw
# frame and its cleaned output). The memo computes it once per (live
# SparkSession, key), eagerly localCheckpoints it (lineage severed, so
# later cache churn can't invalidate it), and hands the SAME frame to
# every same-session consumer. Weak-keyed by the session object: a new
# session recomputes, a stopped-but-alive one is detected and evicted,
# so the driver's independent per-query invocations stay correct.
# Unlike managed_cache, nothing here is ever released mid-sweep -- only
# use it for intermediates whose checkpointed size is small relative
# to executor memory.
# ---------------------------------------------------------------------------

_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def session_checkpoint_memo(
    spark, key: Hashable, builder: Callable[[], DataFrame]
) -> DataFrame:
    per = _MEMO.setdefault(spark, {})
    df = per.get(key)
    if df is not None:
        try:
            if not spark.sparkContext._jsc.sc().isStopped():
                return df
        except Exception:  # noqa: BLE001 -- dead JVM handle: rebuild
            pass
        per.pop(key, None)
    df = builder().localCheckpoint(eager=True)
    per[key] = df
    return df


def evict_session_memos(spark) -> None:
    """Drop every checkpoint memo held for ``spark``.

    The memo has no data-change detection: it is keyed on (session,
    logical key) only, so a same-session caller that REWRITES the files
    under a reused sf_dir (scale smokes, fixture-mutating tests) must
    evict before re-querying or it silently reads the stale checkpoint.
    This is the public spelling of that eviction (round-8 advice; the
    smoke and tests previously reached into the private ``_MEMO``)."""
    _MEMO.pop(spark, None)


def managed_cache(
    *dfs: DataFrame, extend: bool = False
) -> DataFrame | tuple[DataFrame, ...]:
    """Release caches registered by previous queries, then cache and
    register ``dfs``. Returns the single frame, or the tuple when
    several are given. ``extend=True`` skips the release so a
    composite plan can register caches across several calls without
    unpersisting its own earlier ones."""
    if not extend:
        release_caches()
    out = []
    for df in dfs:
        out.append(df.cache())
        _ACTIVE.append(out[-1])
    return out[0] if len(out) == 1 else tuple(out)


def release_caches() -> None:
    """Unpersist every registered cache (best-effort: a stopped session
    must not turn hygiene into an error)."""
    while _ACTIVE:
        df = _ACTIVE.pop()
        try:
            df.unpersist()
        except Exception:
            pass
