"""Bucketed range (inequality) join.

``lo <= fact.value < hi`` (half-open by default; ``hi_inclusive=True``
for the closed BETWEEN form) is the join Spark's
planner can only execute as a broadcast nested loop — every fact row
probes every range row, O(|facts| x |ranges|). This module implements
the standard bucketed decomposition (the same trick the as-of join's
hot-key variant uses for time): explode each range into the fixed-width
buckets it overlaps, equi-join facts to ranges on the bucket id, then
apply the exact bounds as a residual filter. Work drops to
O(|facts| + |ranges| x width/bucket + |matches|), the join becomes a
hash join (broadcast when the exploded range side is small), and the
plan scales with data instead of with the cross product.

Bucket-width choice: ~the median range width. Too narrow multiplies
the exploded range rows; too wide multiplies residual-filter misses.
Overlapping ranges are fully supported — a fact matches every range
that covers it, exactly like the nested-loop semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
    hi_inclusive: bool = False,
) -> DataFrame:
    """Join fact rows to every range row whose [lo, hi) covers the
    fact's value (hi_inclusive=True for closed intervals).

    The exploded range side carries one row per (range, overlapped
    bucket); with K = ceil(range_width / bucket_width) buckets per
    range the build side is |ranges| x K rows — broadcast it when
    small, else it hash-partitions on the bucket like any equi-join.
    `how` supports "inner" and "left" (unmatched facts keep NULL range
    columns; the residual bound predicates run inside the join
    condition so left semantics stay exact).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how!r} (inner|left)")
    clash = {"_bucket"} & (set(facts.columns) | set(ranges.columns))
    if clash:
        raise ValueError(
            "input column '_bucket' collides with the range join's "
            "working column; rename it first (it would be silently "
            "overwritten and dropped)"
        )
    w = float(bucket_width)
    fb = facts.withColumn(
        "_bucket", F.floor(F.col(value_col) / F.lit(w)).cast("long")
    )
    rb = ranges.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
            )
        ),
    )
    upper = (
        fb[value_col] <= rb[hi_col]
        if hi_inclusive
        else fb[value_col] < rb[hi_col]
    )
    cond = (
        (fb["_bucket"] == rb["_bucket"])
        & (fb[value_col] >= rb[lo_col])
        & upper
    )
    return fb.join(rb, cond, how).drop(fb["_bucket"]).drop(rb["_bucket"])
