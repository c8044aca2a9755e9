"""Tracked persist — scoped release of operator-internal caches.

Several operators persist a load-bearing intermediate (the two-pass rank's
sorted+id'd frame in ``operators/ranking.py``, the posting/signature tables
in ``operators/dedup.py`` and ``queries/dedup.py``): correctness requires
both consuming branches to read ONE materialization, because the
intermediates carry nondeterministic projections (sampled range boundaries,
``monotonically_increasing_id``) that two independent recomputations need
not agree on. Those persists cannot be unpersisted inside the operator —
the action that consumes the returned DataFrame happens later, in the
caller/driver.

Previously release relied on callers invoking ``spark.catalog.clearCache()``
— global, evicting unrelated cached data, and easy to forget (each missed
sweep accumulates one cached copy of the input per call). This module
scopes it: operators register what they persist via :func:`track_persist`,
and a sweep releases exactly that set via :func:`release_tracked` after each
entry materializes. ``bench.py`` and ``tests/oracle_harness.py`` call it
between entries; ``tests/test_cache.py`` proves no cached RDD survives an
entry without any ``clearCache``.

At 100 TB nothing changes: persist spills to disk per partition, and the
release is one unpersist per tracked handle — control-plane only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` plus registration for scoped release.

    Use for every operator-internal persist whose lifetime outlasts the
    operator call (the consuming action happens in the caller). Paired
    persist/unpersist inside one function (e.g. ``operators/graph.py``'s
    iteration frames) doesn't need tracking — it already releases itself.
    """
    out = df.persist()
    _TRACKED.append(out)
    return out


def release_tracked() -> int:
    """Unpersist every tracked DataFrame; returns how many were released.

    Safe to call at any quiesce point (between registry entries, after a
    bench measurement). Blocking=False: Spark drops the blocks
    asynchronously, which is fine — the handles are dead to correctness
    the moment the consuming action finished.
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — a dead session can't hold cache
            pass
    return n
