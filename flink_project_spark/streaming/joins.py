"""Stream-stream interval joins — watermark-bounded temporal joins in
Structured Streaming.

The streaming counterpart of `operators/asof.py`: a click stream joined
to the shows that precede it within a horizon. A true per-row argmax
("the single latest show") is not a streaming primitive — the interval
join emits EVERY (click, show) pair inside the horizon, and the
argmax/attribution reduction runs downstream (per micro-batch via
foreachBatch, or in the batch layer over the landed pairs). That is
exactly how Spark scales this: both streams are hash-partitioned on the
equality keys, and the watermark bounds the join state — rows older
than (watermark - horizon) are evicted, so state is
O(key-rate x horizon), not O(stream).

State-bound math for the reference's action logs: with a 1-hour horizon
and 10-minute watermark delay, each side retains ~70 minutes of rows
per key — on a 1000-executor cluster that is a fixed per-core window
buffer regardless of total stream length.

Emission semantics: inner joins emit as soon as both sides arrive;
`how="leftOuter"` additionally emits null-matched clicks, but only once
the watermark passes the click's horizon (a replayed finite source
therefore never emits the outer rows of its final horizon — drive a
closing empty micro-batch or use the batch layer for the tail).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    horizon: str = "1 hour",
    delay: str = "10 minutes",
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """Join each left row to every right row with the same `on` keys and
    ``left_ts - horizon <= right_ts <= left_ts``.

    Both inputs must be streaming DataFrames with event-time columns
    (`left_ts` / `right_ts` must have distinct names). Watermarks are
    applied here with `delay`; the time-range condition is what lets
    Spark bound the join state. Right payload columns whose names
    collide with a left column come out as ``{name}{suffix}`` so the
    output never carries duplicate column names.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must have distinct names")
    if how not in ("inner", "leftOuter", "left_outer", "left"):
        # the projection keeps the LEFT side's key columns and strips
        # the right's — an unmatched rightOuter/fullOuter row would
        # come out with NULL keys, its identity unrecoverable
        raise ValueError(
            f"interval_join_stream supports how='inner'|'leftOuter', "
            f"got {how!r}"
        )
    lw = left.withWatermark(left_ts, delay).alias("l")
    rw = right.withWatermark(right_ts, delay).alias("r")
    conds: list[Column] = [
        F.col(f"l.{k}") == F.col(f"r.{k}") for k in on
    ]
    conds.append(F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    conds.append(
        F.col(f"r.{right_ts}")
        >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {horizon}")
    )
    joined = lw.join(rw, reduce(lambda a, b: a & b, conds), how)
    keep_right = [c for c in right.columns if c not in set(on)]
    lcols = set(left.columns)
    # validate the FULL output name list, not just suffixed-vs-left: a
    # right column that already ends in the suffix (or any other name
    # coincidence) would otherwise emit duplicate output columns
    out_right = [f"{c}{suffix}" if c in lcols else c for c in keep_right]
    out_names = list(left.columns) + out_right
    dupes = sorted({n for n in out_names if out_names.count(n) > 1})
    if dupes:
        raise ValueError(
            f"output columns {dupes} would be duplicated after "
            f"suffixing; rename the colliding columns or pass a "
            f"different suffix"
        )
    return joined.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[
            F.col(f"r.{c}").alias(o)
            for c, o in zip(keep_right, out_right)
        ],
    )


def click_show_pairs_stream(
    actions: DataFrame,
    horizon: str = "1 hour",
    delay: str = "10 minutes",
) -> DataFrame:
    """Attribution candidate pairs from ONE action stream (self-join):
    every (click, show) of the same (user, item) with the show inside
    `horizon` before the click. Downstream argmax over `show_ts` per
    click yields the as-of attribution of `operators/asof.py`.

    Expects columns (user_id, item_id, action, ts) — the valid_actions
    shape with an event-time `ts`.
    """
    clicks = actions.filter(F.col("action") == "click").select(
        "user_id", "item_id", F.col("ts").alias("click_ts")
    )
    shows = actions.filter(F.col("action") == "show").select(
        "user_id", "item_id", F.col("ts").alias("show_ts")
    )
    return interval_join_stream(
        clicks,
        shows,
        on=["user_id", "item_id"],
        left_ts="click_ts",
        right_ts="show_ts",
        horizon=horizon,
        delay=delay,
        how="inner",
    )
