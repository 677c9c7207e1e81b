"""Session-lifetime cache registry for persisted plan intermediates.

Several operators persist an intermediate that the RETURNED (lazy)
plan still references — the shingle-set table under minhash LSH, the
hashed corpus under knn_graph_lsh, the incidence table under
association_rules. Those caches cannot be unpersisted inside the
operator (the caller has not run its action yet), so without
bookkeeping, repeated calls on distinct inputs accumulate cached
tables for the life of the session.

Every such persist is registered here; callers evict in one of two
ways once the consuming action has run:

    from icnarc_to_philips_linkage_spark.operators import cachereg
    cachereg.evict()              # unpersist everything registered
    h = cachereg.live(); ...; cachereg.evict(h)   # scoped: only
                                  # caches registered after live()

Eviction is always safe: an unpersisted block recomputes from lineage
if the plan is re-executed. Operators that consume their cache within
the function body keep unpersisting inline and do not register.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for later eviction."""
    _LIVE.append(df)
    return df


def live() -> int:
    """Watermark for scoped eviction: evict(live_before_call)."""
    return len(_LIVE)


def evict(since: int = 0) -> int:
    """Unpersist every registered cache at index >= ``since``; returns
    how many were released."""
    n = 0
    while len(_LIVE) > since:
        df = _LIVE.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
        n += 1
    return n
