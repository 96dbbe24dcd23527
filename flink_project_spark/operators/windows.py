"""Analytic window functions + event-time bucketing (batch).

The reference emulates window functions with groupBy+sortGroup+reduceGroup
(Flink 1.6 Table API had no batch OVER) — SURVEY.md §2.6. Spark has them
natively; each helper documents which hand-rolled reference pattern it
replaces. The multi-resolution tumbling buckets (5m/15m/1h/1d with +8h
day alignment) mirror the streaming job's window assignment
(flink-statistics ActionLogJobSecond.java:207-231) and run identically in
batch and Structured Streaming via F.window().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_by_score(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    ascending: bool = True,
) -> DataFrame:
    """W1: row_number over (partition, order).

    Ref: AucCalcVersion5.java:302-311 (rank assignment via sortGroup +
    reduceGroup with a running counter). Callers should pass tie-breaking
    columns so the total order (and thus rn) is deterministic under
    repartitioning.
    """
    order = [
        F.col(c).asc() if ascending else F.col(c).desc() for c in order_cols
    ]
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return df.withColumn("rn", F.row_number().over(w))


def tie_averaged_rank(
    df: DataFrame, partition_cols: list[str], order_col: str
) -> DataFrame:
    """W2: Mann-Whitney tie-averaged rank (same score -> mean of positions).

    Ref: AucCalcVersion5.java:312-340 — the reference walks each sorted
    group accumulating same-score runs and assigns the mean position.
    Closed form without a second shuffle: avg(row_number) over
    (partition, score) — both windows share the same partitioning so
    Catalyst plans ONE exchange + sort.
    """
    w_rank = Window.partitionBy(*partition_cols).orderBy(F.col(order_col).asc())
    w_ties = Window.partitionBy(*partition_cols, order_col)
    return df.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "avg_rank", F.avg(F.col("rn").cast("double")).over(w_ties)
    )


def lag_delta(
    df: DataFrame,
    partition_col: str,
    order_cols: list[str],
    value_col: str,
    threshold: float,
) -> DataFrame:
    """W4 batch analog: per-key lag-1 delta with alert flag.

    Ref: flink-base TempChangeAlert.scala:11-21 (ValueState holding the
    previous temperature; emit when |cur - prev| >= threshold). The
    streaming form lives in streaming.stateful; this is the batch window
    equivalent used for stream/batch equivalence tests. Pass tie-breaking
    order columns for a deterministic total order.
    """
    w = Window.partitionBy(partition_col).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    prev = F.lag(value_col).over(w)
    return (
        df.withColumn("prev_value", prev)
        .withColumn(
            "delta",
            F.when(prev.isNotNull(), F.abs(F.col(value_col) - prev)),
        )
        .withColumn(
            "alert",
            F.when(F.col("delta") >= threshold, F.lit(1)).otherwise(F.lit(0)),
        )
    )


def ordered_group_list(
    df: DataFrame,
    group_cols: list[str],
    sort_col: str,
    payload_col: str,
    ascending: bool = False,
) -> DataFrame:
    """W3: per-group list ordered by a sort key (frame = whole group).

    Ref: ItemIdCfVersion5.java:221-240 (sortGroup desc + reduceGroup
    string-assembly of neighbor lists). collect_list order is
    non-deterministic pre-sort, so sort_array over (sort_key, payload)
    structs makes it deterministic — no Window shuffle needed beyond the
    groupBy itself.
    """
    pair = F.struct(F.col(sort_col), F.col(payload_col))
    return df.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(pair), asc=ascending).alias("items")
    )


def tumbling_counts(
    events: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    value_col: str | None = "value",
) -> DataFrame:
    """T1/T2 batch form: tumbling event-time window counts + value sum
    (pass value_col=None for count-only inputs without a value column).

    F.window() works identically over batch and streaming DataFrames, so
    this single operator serves both the batch analog and (with
    withWatermark upstream) the streaming job. Windows align to the epoch,
    matching DuckDB's time_bucket for oracle checks.

    sum_value quantizes each double to cents with an EXPLICIT
    floor(x*100 + 0.5) before the exact decimal sum: a double->decimal
    CAST rounds the shortest decimal repr HALF_UP in Spark but the exact
    binary value in DuckDB, so inputs like 1.305 (binary ~1.30499...)
    would disagree; floor of the identical double is engine-independent.

    Negative-value rounding semantics: floor(x*100 + 0.5) rounds halves
    toward +infinity for NEGATIVE values too (-1.305 -> -130 cents),
    whereas a decimal(18,2) cast would round HALF_UP away from zero
    (-1.31). The engine and every oracle apply the identical rule, so
    parity holds; callers needing ledger-style half-away-from-zero on
    negative amounts should apply a sign-aware quantization first.
    """
    aggs = [F.count(F.lit(1)).alias("cnt")]
    out_cols = ["cnt"]
    if value_col is not None:
        cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast(
            "decimal(28,0)"
        )
        aggs.append(
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("sum_value")
        )
        out_cols.append("sum_value")
    return (
        events.groupBy(F.window(F.col(ts_col), duration).alias("w"), *keys)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            *out_cols,
        )
    )


def _duration_seconds(d: str) -> int:
    """Seconds in a Spark interval string. Accepts everything
    ``F.window`` does at whole-second granularity: compound strings
    ('1 hour 30 minutes') and weeks — a parser narrower than the
    engine's would reject durations the windows themselves accept."""
    mult = {
        "second": 1,
        "seconds": 1,
        "minute": 60,
        "minutes": 60,
        "hour": 3600,
        "hours": 3600,
        "day": 86400,
        "days": 86400,
        "week": 604800,
        "weeks": 604800,
    }
    toks = d.split()
    if not toks or len(toks) % 2 != 0:
        raise ValueError(f"cannot parse duration {d!r}")
    total = 0
    for n, unit in zip(toks[::2], toks[1::2]):
        # Spark interval units are case-insensitive; match that
        if unit.lower() not in mult:
            raise ValueError(f"cannot parse duration {d!r}: unit {unit!r}")
        total += int(n) * mult[unit.lower()]
    if total <= 0:
        # F.window raises 'must be positive' up front for this; the
        # pmod grid would instead divide by zero (NULL window_start for
        # every row under non-ANSI — silently wrong)
        raise ValueError(f"duration must be positive, got {d!r}")
    return total


def multi_resolution_counts(
    events: DataFrame,
    ts_col: str,
    keys: list[str],
    resolutions: dict[str, str] | None = None,
    day_offset_hours: int = 8,
) -> DataFrame:
    """T5: multi-resolution tumbling windows (5m/15m/1h/1d, +8h-aligned day).

    Ref: ActionLogJobSecond.java:207-231 — the reference assigns each
    event to ALL resolutions' windows via floor-division in one pass;
    this operator does the same: ONE scan, each row exploded into its
    (resolution, window_start) assignments, one partial-aggregated
    groupBy. The earlier union-of-four-groupBys form read the events
    table four times — at 100 TB that is 4x the IO for identical
    output, so the explode form is the scale path (the exploded rows
    collapse map-side to the tiny per-(resolution, window, key)
    cardinality before the single exchange).

    The window starts are the same floor-division the reference runs
    (java:208-226); the day grid is shifted by -day_offset_hours so day
    windows start at 16:00 UTC == 00:00 UTC+8 (Asia/Shanghai
    dashboards: java:226), exactly like F.window(startTime=-8h).
    """
    resolutions = resolutions or {
        "5m": "5 minutes",
        "15m": "15 minutes",
        "1h": "1 hour",
        "1d": "1 day",
    }
    us = F.unix_micros(F.col(ts_col))
    entries = []
    for label, dur in resolutions.items():
        dur_us = _duration_seconds(dur) * 1_000_000
        # the day alignment keys on the DURATION, not the label — a
        # custom resolutions dict naming its 1-day entry anything else
        # still gets the documented +8h day grid
        off_us = (
            -day_offset_hours * 3600 * 1_000_000
            if _duration_seconds(dur) == 86400
            else 0
        )
        start = (us - off_us) - F.pmod(us - off_us, F.lit(dur_us)) + off_us
        entries.append(
            F.struct(
                F.lit(label).alias("resolution"),
                F.timestamp_micros(start).alias("window_start"),
            )
        )
    return (
        events.filter(F.col(ts_col).isNotNull())
        .select(F.explode(F.array(*entries)).alias("rw"), *keys)
        .groupBy(
            F.col("rw.resolution").alias("resolution"),
            F.col("rw.window_start").alias("window_start"),
            *keys,
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    keys: list[str],
) -> DataFrame:
    """Sliding (hopping) event-time window counts.

    The reference has no sliding windows (SURVEY §2.8 note) — Spark
    provides them for free via F.window(size, slide); each event lands
    in size/slide windows. Runs identically in batch and (with a
    watermark) Structured Streaming. Window starts align to the epoch
    grid of `slide`, so a DuckDB oracle can enumerate each event's
    covering windows with generate_series.
    """
    return (
        events.groupBy(F.window(F.col(ts_col), size, slide).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), *keys, "cnt")
    )


def session_counts(
    events: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
) -> DataFrame:
    """Session windows: per-key activity runs separated by >= gap.

    Batch form of F.session_window (also legal in streaming with a
    watermark). Emits one row per (keys, session) with the session
    start/end and event count. Oracle-checkable: the classic
    gaps-and-islands SQL (lag + cumulative new-session flags) produces
    identical sessions.
    """
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), *keys
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            "cnt",
        )
    )


def exact_rank_expr(q: float, n_col: str):
    """ceil(q * n) as INTEGER-EXACT arithmetic: q quantized to
    micro-units so the rank never inherits a float artifact (0.1*230
    is 23.000000000000004 in binary64 — float ceil picks rank 24, the
    documented rule says 23). THE shared exact-discrete-quantile rank
    rule — `llm.text.length_profile`, `operators.profiling.
    key_skew_profile`, and their DuckDB oracles all use this exact
    formula; a change here moves them together."""
    qm = int(round(q * 1_000_000))
    return F.expr(f"(({qm} * {n_col}) + 999999) div 1000000")


def global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "grank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based GLOBAL rank without a single-reducer window.

    ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses
    the whole table onto one task — the classic scale-killer for total
    ordering. This operator produces the identical rank with bounded
    parallelism, the standard distributed-ranking construction:

    1. ``repartitionByRange(order_cols)`` — partition i holds a
       contiguous key range, ranges ascending with i (sampled range
       boundaries; correctness needs only range-monotonicity, which the
       partitioner guarantees);
    2. per-partition ``row_number`` over a window keyed on the
       partition id (parallel — one sort per partition, no shuffle
       beyond the range exchange);
    3. per-partition counts -> cumulative offsets. The offsets table
       has ``num_partitions`` rows, so its running-sum window is a
       single-reducer over a FEW HUNDRED rows (driver-bounded, not
       data-bounded), and the join back is a broadcast on partition id.

    Global rank = offset + local row_number. Ties: pass a tie-breaking
    column (e.g. the primary key) in ``order_cols`` — with a unique
    composite key, equal-prefix rows may land in different range
    partitions but their total order (and hence rank) is still exact.

    The row_number table is PERSISTED: the offsets branch and the main
    branch both consume it, and the range partitioner's sampled
    boundaries are not deterministic across independent executions —
    without the pin, offsets computed from one partitioning could join
    row numbers from another (exchange reuse usually prevents this,
    but correctness must not hang on an optimizer toggle).

    Returns ``df`` with ``rank_col`` (BIGINT) appended.
    """
    from flink_project_spark.cache import persist_tracked

    part = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    d = part.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    rn = persist_tracked(
        d.withColumn("_rn", F.row_number().over(w)), label="global_rank_rn"
    )
    counts = rn.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    woff = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off"),
    )
    return (
        rn.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


def rolling_time_agg(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    window_seconds: int,
    scale: int = 1000000,
) -> DataFrame:
    """Per-key trailing time-window aggregates: for every row, the
    count/sum/mean of `value_col` over the PRECEDING `window_seconds`
    (inclusive of the current row's instant) of that key's events.

    The batch twin of a sliding streaming aggregate, as a single
    RANGE-framed window over unix seconds — one exchange on the keys,
    one per-partition sort, no self-join (the naive form joins the
    table to itself on `0 <= t_a - t_b <= W`, quadratic on active
    keys). The sum is quantized (floor(x*scale + 0.5), exact int64
    accumulation) so any engine's RANGE frame reproduces it
    bit-for-bit; the mean is one IEEE division on exact integers.
    Ties on the timestamp: a RANGE frame includes ALL rows at the
    boundary instants — deterministic by SQL definition, no tie-break
    column needed. NULL values follow SQL COUNT(value)/AVG semantics:
    they are excluded from count, sum, AND mean (a count(*) here would
    make the mean neither AVG nor a row mean); an all-NULL window
    reports w_count 0 with NULL sum/mean.
    """
    sec = F.unix_timestamp(F.col(ts_col))
    q = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy(*keys)
        .orderBy(sec)
        .rangeBetween(-(int(window_seconds)), 0)
    )
    cnt = F.count(F.col(value_col)).over(w)
    s = F.sum(q).over(w)
    return df.select(
        *keys,
        ts_col,
        value_col,
        cnt.alias("w_count"),
        (s.cast("double") / F.lit(float(scale))).alias("w_sum"),
        (
            s.cast("double") / F.lit(float(scale)) / cnt.cast("double")
        ).alias("w_mean"),
    )


def gap_fill_counts(
    events: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
) -> DataFrame:
    """Dense calendar resample: `tumbling_counts` with EVERY bucket of
    the observed time range present for EVERY key — missing buckets
    filled with cnt 0. The export/dashboard form of T1: a chart, a
    forecast model, or a rate-anomaly scan needs the zero rows, which
    the sparse groupBy omits by construction.

    Plan: the sparse count (the one data-scaled exchange) + a calendar
    exploded from a 1-row global min/max aggregate via sequence() —
    calendar size = time-range / duration, INDEPENDENT of event volume
    — crossed with the distinct-key table and left-joined back. The
    cross is a broadcast of the bounded calendar (|keys| x |buckets|
    rows); rows with NULL timestamps never enter the calendar range
    and are dropped, same as the oracle's time_bucket(NULL).
    """
    bucket = F.window(F.col(ts_col), duration)["start"]
    sparse = (
        events.groupBy(bucket.alias("window_start"), *keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("window_start").isNotNull())
    )
    calendar = (
        events.agg(
            F.min(bucket).alias("_mn"), F.max(bucket).alias("_mx")
        )
        .filter(F.col("_mn").isNotNull())
        .select(
            F.explode(
                F.expr(f"sequence(_mn, _mx, interval {duration})")
            ).alias("window_start")
        )
    )
    key_table = events.select(*keys).distinct()
    dense = key_table.crossJoin(F.broadcast(calendar))
    # null-safe key equality: a NULL key forms its own series (the
    # distinct key table emits it), and its sparse counts must match
    # the dense grid — plain `=` would zero-fill every NULL-key bucket
    # while the events exist
    cond = dense["window_start"] == sparse["window_start"]
    for k in keys:
        cond = cond & dense[k].eqNullSafe(sparse[k])
    return dense.join(sparse, cond, "left").select(
        dense["window_start"],
        *[dense[k] for k in keys],
        F.coalesce(sparse["cnt"], F.lit(0)).cast("long").alias("cnt"),
    )
