"""Ordered event-sequence (funnel) analysis.

The reference's Flink jobs compute per-scene CTRs and windowed counts;
the natural next question a product analyst asks is sequential — "of
the users who viewed, how many then clicked, then purchased?". Flink
answers it with CEP; Spark has no CEP library, but the classic funnel
semantics (match the steps IN ORDER, each after the previous) reduce
to a chain of conditional min-aggregations, entirely in Catalyst:

    t1(u) = min ts of step-1 events of u
    t_i(u) = min ts of step-i events of u with ts > t_{i-1}(u)

The greedy "earliest qualifying event per step" choice is optimal for
subsequence matching, so a user completes the funnel iff t_k exists.
An optional `horizon` bounds the whole journey relative to t1 (the
user's FIRST entry — the standard funnel-anchoring convention; a CEP
engine that re-anchors on every step-1 event answers a different,
strictly more expensive question).

Scale: k steps = k filtered passes over the (pre-filtered, column-
pruned) events scan, each joined+aggregated on the user key — the
partitioning on `user_col` is reused across all k rounds, and no
per-user array ever materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon_seconds: int | None = None,
) -> DataFrame:
    """Per-user earliest step-completion times: (user, t1..tk), one row
    per user who completed at least step 1; t_i is NULL once the chain
    breaks (later t's are NULL too — prefix semantics)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    reserved = {f"t{i}" for i in range(1, len(steps) + 1)} & set(
        events.columns
    )
    if reserved:
        raise ValueError(
            f"events columns {sorted(reserved)} collide with the "
            "funnel's computed step-time columns t1..tk; rename them"
        )
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    out = cur
    for i, s in enumerate(steps[1:], start=2):
        cond = F.col(ts_col) > F.col(f"t{i - 1}")
        if horizon_seconds is not None:
            cond = cond & (
                F.col(ts_col)
                <= F.col("t1") + F.expr(f"INTERVAL {horizon_seconds} SECONDS")
            )
        nxt = (
            events.filter(F.col(type_col) == s)
            # dict.fromkeys dedups: at i=2 the anchor IS t1
            .join(
                out.select(*dict.fromkeys([user_col, "t1", f"t{i - 1}"])),
                user_col,
            )
            .filter(cond)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        out = out.join(nxt.select(user_col, f"t{i}"), user_col, "left")
    return out


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon_seconds: int | None = None,
) -> DataFrame:
    """Funnel conversion summary: one row per step with the user count
    that reached it (in order) and the conversion percentage from step
    1 (single IEEE division on exact counts).

    ONE aggregation pass: count(t_i) skips NULLs, so all k step counts
    come from a single scan of the funnel-times table (a per-step
    filter+agg union would re-execute the k-join times plan k times);
    the k-row summary then explodes from the 1-row count frame —
    constant-size work, no window."""
    times = funnel_times(
        events, steps, user_col, type_col, ts_col, horizon_seconds
    )
    counts = times.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"_c{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    entry = F.greatest(F.col("_c1"), F.lit(1)).cast("double")
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("step"),
                F.lit(s).alias("step_name"),
                F.col(f"_c{i}").alias("users"),
                (
                    F.col(f"_c{i}").cast("double") / entry * 100.0
                ).alias("conversion_pct"),
            )
            for i, s in enumerate(steps, start=1)
        ]
    )
    return counts.select(F.explode(rows).alias("_r")).select(
        "_r.step", "_r.step_name", "_r.users", "_r.conversion_pct"
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST activity
    period, counted in every later period they return.

    (cohort, period_offset, users) with offset 0 = the cohort size.
    `period` is day, week, or month (the units whose offset arithmetic
    is implemented exactly below). Two aggregations — first-period
    per user (one exchange on the user key), then distinct
    (cohort, offset, user) counting (one exchange on the matrix key);
    the per-user first period rides the same user partitioning the
    first aggregate produced. Offsets are exact date arithmetic
    (datediff of truncated dates over the unit length), so any SQL
    engine reproduces the matrix bit-for-bit.
    """
    if period not in ("day", "week", "month"):
        raise ValueError(f"unsupported period: {period!r} (day|week|month)")
    bucket = F.date_trunc(period, F.col(ts_col)).cast("date")
    ev = events.select(F.col(user_col).alias("u"), bucket.alias("p"))
    first = ev.groupBy("u").agg(F.min("p").alias("cohort"))
    if period == "month":
        off = (F.year("p") - F.year("cohort")) * 12 + (
            F.month("p") - F.month("cohort")
        )
    else:
        days = 7 if period == "week" else 1
        off = F.floor(F.datediff(F.col("p"), F.col("cohort")) / days)
    return (
        ev.join(first, "u")
        .select("u", "cohort", off.cast("int").alias("period_offset"))
        .distinct()
        .groupBy("cohort", "period_offset")
        .agg(F.count(F.lit(1)).alias("users"))
    )
