"""Lifecycle tests for the materialized-intermediate registry."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_project_spark import cache as CACHE


def test_materialize_memoizes_and_clear_releases(spark):
    calls = []

    def build():
        calls.append(1)
        return spark.range(100).withColumn("x", F.col("id") * 2)

    a = CACHE.materialize(spark, "t_lifecycle", build)
    b = CACHE.materialize(spark, "t_lifecycle", build)
    assert a is b and len(calls) == 1
    assert a.storageLevel.useMemory
    n = CACHE.clear(spark)
    assert n >= 1
    assert not a.storageLevel.useMemory  # actually unpersisted
    # rebuild after clear runs the builder again
    CACHE.materialize(spark, "t_lifecycle", build)
    assert len(calls) == 2
    CACHE.clear(spark)


def test_persist_tracked_released_by_clear(spark):
    df = CACHE.persist_tracked(spark.range(50), "t_internal")
    df.count()
    assert df.storageLevel.useMemory
    CACHE.clear(spark)
    assert not df.storageLevel.useMemory


def test_clear_scopes_to_session(spark):
    """clear(spark) must release this session's entries and leave the
    registry consistent (keys are applicationId-based, not id()-based)."""
    CACHE.materialize(spark, "t_scope", lambda: spark.range(10))
    sid = spark.sparkContext.applicationId
    assert any(k[0] == sid for k in CACHE._CACHE)
    CACHE.clear(spark)
    assert not any(k[0] == sid for k in CACHE._CACHE)
