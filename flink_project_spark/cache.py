"""Materialized-intermediate registry with an explicit lifecycle.

Several query groups share expensive intermediates (the item-CF cosine
table, the MinHash near-dup pair table, the spread documents corpus).
Recomputing them per query dominated the round-1 bench, so they are
persisted once per (session, key) here. Unlike ad-hoc module-level
dicts, this registry exposes ``clear()`` so a long-lived session can
release executor memory — the cluster-scale analog is writing each
intermediate to parquet once per pipeline run and dropping it when the
pipeline finishes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[int, str], DataFrame] = {}


def materialize(
    spark: SparkSession, key: str, builder: Callable[[], DataFrame]
) -> DataFrame:
    """Build-once, persist, and memoize a DataFrame per (session, key)."""
    k = (id(spark), key)
    df = _CACHE.get(k)
    if df is None:
        df = builder().persist()
        _CACHE[k] = df
    return df


def clear(spark: SparkSession | None = None) -> int:
    """Unpersist and forget cached intermediates.

    With a session, clears only that session's entries; without, clears
    everything. Returns the number of entries released. Also clears the
    fixture table/view memoization so a re-`materialize` starts from a
    clean plan.
    """
    sid = None if spark is None else id(spark)
    n = 0
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
    return n
