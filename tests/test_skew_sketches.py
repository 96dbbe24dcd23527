"""Salted-join equivalence and HLL sketch-rollup losslessness.

`salted_join` must be row-for-row the plain join under a skewed key
distribution (including null-matching and left-outer preservation);
`uv_sketches`/`uv_rollup` must give the SAME estimate whether the
sketch is built in one pass or merged from per-partition sketches —
that equality is what makes the persist-sketches-once layout safe at
100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_project_spark.operators.sketches import uv_rollup, uv_sketches
from flink_project_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # one hot key (0) carrying 5k rows, a cold tail, and keys with no
    # match on the other side in both directions
    big = spark.range(0, 6000).select(
        F.when(F.col("id") < 5000, F.lit(0))
        .otherwise((F.col("id") % 97) + 1)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 60).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
    )
    return big, small


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain_join(spark, how):
    big, small = _skewed_frames(spark)
    plain = big.join(small, on=["k"], how=how)
    salted = salted_join(big, small, on=["k"], salt=8, how=how, seed=7)
    assert salted.columns == plain.columns
    # order-insensitive multiset equality
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_salted_join_rejects_right_full():
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(None, None, on=["k"], how="full")


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in >1 shuffle partition after
    salting — the whole point of the operator."""
    big, small = _skewed_frames(spark)
    j = salted_join(big, small, on=["k"], salt=8, seed=7)
    hot = j.filter(F.col("k") == 0).select(
        F.spark_partition_id().alias("pid")
    )
    npids = hot.distinct().count()
    assert npids > 1, f"hot key stayed in {npids} partition(s)"


def test_uv_sketch_rollup_is_lossless(spark):
    """estimate(union of per-day sketches) == estimate(one sketch over
    the union of the data), and both are within 5% of the exact UV."""
    df = spark.range(0, 20000).select(
        (F.col("id") % 7).alias("day"),
        # ids overlap across days so the rollup must dedupe across
        # partitions, not just sum
        (F.col("id") % 3000).alias("user_id"),
    )
    per_day = uv_sketches(df, ["day"], "user_id")
    assert per_day.count() == 7
    merged = uv_rollup(per_day, []).collect()[0]["uv_estimate"]
    direct = (
        uv_sketches(df.withColumn("all", F.lit(1)), ["all"], "user_id")
        .collect()[0]["uv_estimate"]
    )
    assert merged == direct, (merged, direct)
    exact = df.select("user_id").distinct().count()
    assert abs(merged - exact) / exact < 0.05


def test_uv_sketch_partial_rollup_grain(spark):
    """Rolling 7 daily sketches up to 2 week-buckets keeps the grain
    columns and estimates each bucket over its own days only."""
    df = spark.range(0, 10000).select(
        (F.col("id") % 7).alias("day"),
        (F.col("id") % 911).alias("user_id"),
    )
    per_day = uv_sketches(df, ["day"], "user_id").withColumn(
        "week", (F.col("day") < 4).cast("int")
    )
    by_week = uv_rollup(per_day, ["week"])
    rows = {r["week"]: r["uv_estimate"] for r in by_week.collect()}
    assert set(rows) == {0, 1}
    # every user id appears on every day here, so each week's UV is
    # the full population — the merge must not inflate it
    exact = 911
    for est in rows.values():
        assert abs(est - exact) / exact < 0.05


def test_salted_join_rejects_working_column_collision(spark):
    """An input already carrying __skew_salt would be silently
    overwritten and dropped — rejected up front instead."""
    import pytest as _pytest

    from flink_project_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, 0)], "k long, __skew_salt int")
    small = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError, match="__skew_salt"):
        salted_join(big, small, ["k"])


def test_range_join_rejects_bucket_column_collision(spark):
    """Same guard for the range join's _bucket working column."""
    import pytest as _pytest

    from flink_project_spark.operators.rangejoin import range_join_bucketed

    facts = spark.createDataFrame([(1, 5.0, "x")], "fid long, v double, _bucket string")
    ranges = spark.createDataFrame([(1, 0.0, 10.0)], "rid long, lo double, hi double")
    with _pytest.raises(ValueError, match="_bucket"):
        range_join_bucketed(facts, ranges, "v", "lo", "hi", 10.0)


def test_key_skew_profile_empty_input_zero_profile(spark):
    """An empty slice profiles as zeros, not an all-NULL row that a
    planning comparison would choke on; working-column collisions are
    rejected up front."""
    from flink_project_spark.operators.profiling import key_skew_profile

    df = spark.createDataFrame([], "k string, v int")
    row = key_skew_profile(df, "k").collect()[0]
    assert (row.n_keys, row.n_rows, row.max_group) == (0, 0, 0)
    assert row.top1_share_pct == 0.0
    assert all(
        getattr(row, f) == 0 for f in row.asDict() if f.endswith("_group")
    )
    bad = spark.createDataFrame([(1, 2)], "_cnt long, v long")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="collide"):
        key_skew_profile(bad, "_cnt")
