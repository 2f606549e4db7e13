"""Cache-lifetime registry (ADVICE r2: leaked persists).

Operators persist fan-out intermediates (a DF feeding 2-3 consumers
re-executes its UDF pipeline per consumer otherwise — measured 5×,
29 s → 5.5 s in round 2). Spark's CacheManager holds strong references,
so in a long-lived driver those blocks accumulate until storage
eviction. The registry makes the lifetime explicit:

- operators call :func:`track` instead of ``.persist()``;
- after materializing an operator's result, a long-lived caller
  (bench loop, pipeline driver, notebook) calls
  :func:`release_caches` to unpersist everything tracked since.

``release_caches`` is safe to call at any time: tracked plans are
lazily re-persistable, so releasing between a plan's construction and
its materialization only costs recomputation, never correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for a later release_caches()."""
    df.persist()
    _LIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked intermediate; returns how many."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to reclaim
    return n
