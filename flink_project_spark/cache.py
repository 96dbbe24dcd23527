"""Materialized-intermediate registry with an explicit lifecycle.

Several query groups share expensive intermediates (the item-CF pair
table, the MinHash near-dup pair table, the spread documents corpus).
Recomputing them per query dominated the round-1 bench, so they are
persisted once per (session, key) here. Unlike ad-hoc module-level
dicts, this registry exposes ``clear()`` so a long-lived session can
release executor memory — the cluster-scale analog is writing each
intermediate to parquet once per pipeline run and dropping it when the
pipeline finishes.

Keys use ``sparkContext.applicationId`` (not ``id(spark)``): a stopped
session's Python object id can be reused by a later session, which
would hand out persisted DataFrames bound to a dead SparkContext.
Operators that persist *internal* step tables (e.g. the exploded
shingle table inside ``llm.dedup.near_dup_pairs``) register them via
``persist_tracked`` so ``clear()`` releases those too.
"""

from __future__ import annotations

import itertools
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[str, str], DataFrame] = {}
_seq = itertools.count()
# guards the check-then-build in materialize(): the bench builds chains
# from concurrent threads (FAIR scheduler), and two racing builders
# would both persist — the loser's handle would be overwritten in the
# registry and its cached blocks pinned with no clear() reference.
# builder() only CONSTRUCTS a plan and marks it persisted (both lazy
# and fast), so one lock does not serialize any real compute. RLock:
# builders routinely materialize their own inputs (the item-CF pair
# builder materializes the history arrays), so the same thread
# re-enters while holding the lock.
_LOCK = threading.RLock()


def _sid(spark: SparkSession) -> str:
    return spark.sparkContext.applicationId


def _sid_or_none(spark: SparkSession) -> str | None:
    """applicationId, or None when the session is already stopped
    (sparkContext._jsc is None and the property raises) — clear() must
    still run its registry/fixture cleanup in that case instead of
    dying before releasing anything.

    Known limitation (deliberate): keying on applicationId means
    SIBLING sessions (spark.newSession()) share one registry scope —
    this engine runs one session per process (bench, driver, tests);
    a multi-tenant deployment would key on the session object like
    fixtures.py does."""
    try:
        return spark.sparkContext.applicationId
    except Exception:
        return None


def materialize(
    spark: SparkSession, key: str, builder: Callable[[], DataFrame]
) -> DataFrame:
    """Build-once, persist, and memoize a DataFrame per (session, key)."""
    k = (_sid(spark), key)
    with _LOCK:
        df = _CACHE.get(k)
        if df is None:
            df = builder().persist()
            _CACHE[k] = df
    return df


def persist_tracked(df: DataFrame, label: str = "internal") -> DataFrame:
    """Persist a step table AND register it for ``clear()`` release.

    For persists that are internal to one operator call (not shared
    across queries): they are not memoized — every call persists anew —
    but the registry remembers them so the advertised lifecycle hook
    actually frees all executor memory.
    """
    k = (_sid(df.sparkSession), f"_tracked:{label}:{next(_seq)}")
    out = df.persist()
    with _LOCK:
        _CACHE[k] = out
    return out


def clear(spark: SparkSession | None = None) -> int:
    """Unpersist and forget cached intermediates (memoized AND tracked).

    With a session, clears only that session's entries; without, clears
    everything. Returns the number of entries released. Also clears the
    fixture table/view memoization so a re-`materialize` starts from a
    clean plan.
    """
    sid = None if spark is None else _sid_or_none(spark)
    if spark is not None and sid is None:
        # stopped session: its applicationId is gone, so its registry
        # entries can't be matched by key — but they're all dead (their
        # cached blocks died with the executors). Drop every entry
        # whose DataFrame's session no longer answers, instead of
        # raising before any cleanup.
        n = 0
        with _LOCK:
            for k in list(_CACHE):
                try:
                    _CACHE[k].sparkSession.sparkContext.applicationId
                except Exception:
                    del _CACHE[k]
                    n += 1
        from flink_project_spark import fixtures as FX

        FX.clear_tables(spark)
        return n
    n = 0
    with _LOCK:
        for k in list(_CACHE):
            if sid is None or k[0] == sid:
                try:
                    _CACHE[k].unpersist()
                except Exception:
                    pass  # session already stopped; nothing to release
                del _CACHE[k]
                n += 1
    from flink_project_spark import fixtures as FX

    FX.clear_tables(spark)
    # the contract layer keeps two applicationId-keyed side tables (the
    # deferred LSH-cap audit plan, the trained k-means models); evict
    # them with the same scope so a cleared session never hands back a
    # stale plan over an unpersisted table
    from flink_project_spark.llm import contract as _contract

    _contract.evict_session(sid)
    return n
