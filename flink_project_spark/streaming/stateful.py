"""Custom stateful streaming operators — T9-T11 (KeyedProcessFunction
parity) via applyInPandasWithState.

The reference registers per-key timers and ValueState inside
KeyedProcessFunctions; Spark's arbitrary stateful op gives the same
contract: per-key state + processing-time timeouts, Arrow-batched.

Scale notes: state is partitioned by key across executors exactly like
Flink's keyed state; the Pandas functions below touch only their own
key's rows per micro-batch. State size is O(1) per key (a couple of
scalars), so the state store stays tiny even at 100 TB/day event rates.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def _sorted_batch(
    pdfs: Iterable[pd.DataFrame], ts_col: str, value_col: str
) -> pd.DataFrame | None:
    """Concatenate a group's Arrow chunks and impose the deterministic
    (ts, value) processing order. Returns None for an empty batch.

    Rows with a NULL timestamp or NULL value are EXCLUDED: a
    time-ordered state transition has no defined position for them
    (same convention as the as-of join's NULL-time exclusion), and
    Arrow renders a NULL long column as float64 NaN, which would
    otherwise crash the int64 conversion and kill the streaming query
    on permanent retry-replay."""
    frames = [p for p in pdfs if len(p)]
    if not frames:
        return None
    pdf = frames[0] if len(frames) == 1 else pd.concat(frames)
    pdf = pdf[pdf[ts_col].notna() & pdf[value_col].notna()]
    if not len(pdf):
        return None
    return pdf.sort_values([ts_col, value_col], kind="mergesort")


def count_with_timeout(
    stream: DataFrame,
    key_col: str = "id",
    timeout_ms: int = 30_000,
) -> DataFrame:
    """T9: emit (key, count, last_seen) once a key has been silent for
    `timeout_ms` of processing time.

    Ref: flink-process myprocess/CountWithTimeoutFunction.java:14-67 —
    ValueState{count, lastModified} + a processing-time timer re-armed on
    every event; onTimer EMITS the count but never clears the state
    (java:53-66: out.collect only), so the count keeps accumulating
    across timeouts. Identical here: the timeout branch emits and keeps
    (count, last_ts); the timer is not re-armed until the key's next
    event, so a silent key emits once per silence, and state for a
    forever-silent key is retained — the same retention the reference
    has (one tiny row per key).
    """
    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("last_seen_ms", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("cnt", T.LongType()),
            T.StructField("last_seen_ms", T.LongType()),
        ]
    )

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            cnt, last = state.get
            # reference parity: emit WITHOUT clearing the count — the
            # reference's onTimer only collects (java:53-66), so the
            # count keeps accumulating. The state re-write is REQUIRED:
            # leaving the row untouched would also leave the old
            # timeout timestamp in the store, and the key would re-fire
            # (re-emitting the same count) every trigger; updating
            # without setTimeoutDuration clears the pending timer until
            # the key's next event re-arms it.
            state.update((cnt, last))
            yield pd.DataFrame(
                {"key": [str(key[0])], "cnt": [cnt], "last_seen_ms": [last]}
            )
            return
        cnt, last = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            cnt += len(pdf)
            if "event_ms" in pdf.columns and len(pdf):
                # NULL event times (NaN after Arrow) don't advance
                # last_seen; an all-NULL chunk leaves it unchanged
                mx = pdf["event_ms"].max()
                if pd.notna(mx):
                    last = max(last, int(mx))
        state.update((cnt, last))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({"key": [], "cnt": [], "last_seen_ms": []}).astype(
            {"key": object, "cnt": "int64", "last_seen_ms": "int64"}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def delta_alert(
    stream: DataFrame,
    key_col: str = "id",
    ts_col: str = "event_ms",
    value_col: str = "temperature",
    threshold: float = 10.0,
) -> DataFrame:
    """T11: per-key |current - previous| >= threshold alert.

    Ref: flink-base TempChangeAlert.scala:11-21 (ValueState lastTemp).
    State = last value; within a micro-batch rows are processed in
    (ts, value) order so replaying a batch is deterministic. The batch
    analog (operators.windows.lag_delta) computes the identical alerts —
    asserted by the stream/batch equivalence test.

    Vectorized: the lag compare is a shift over the sorted batch (the
    state's last value seeds position 0), not a per-row iterrows loop —
    on a busy key a micro-batch holds thousands of readings and the
    Python-loop form was the round-1 scale hazard.
    """
    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("event_ms", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("prev_value", T.DoubleType()),
            T.StructField("delta", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("last_value", T.DoubleType())])

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        prev0 = state.get[0] if state.exists else None
        pdf = _sorted_batch(pdfs, ts_col, value_col)
        if pdf is None:
            yield pd.DataFrame(
                {
                    "key": pd.Series(dtype=object),
                    "event_ms": pd.Series(dtype="int64"),
                    "value": pd.Series(dtype="float64"),
                    "prev_value": pd.Series(dtype="float64"),
                    "delta": pd.Series(dtype="float64"),
                }
            )
            return
        vals = pdf[value_col].to_numpy(dtype="float64")
        ts = pdf[ts_col].to_numpy(dtype="int64")
        prevs = np.empty_like(vals)
        prevs[0] = np.nan if prev0 is None else prev0
        prevs[1:] = vals[:-1]
        delta = np.abs(vals - prevs)
        mask = ~np.isnan(prevs) & (delta >= threshold)
        state.update((float(vals[-1]),))
        yield pd.DataFrame(
            {
                "key": np.full(int(mask.sum()), str(key[0]), dtype=object),
                "event_ms": ts[mask],
                "value": vals[mask],
                "prev_value": prevs[mask],
                "delta": delta[mask],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def rising_value_warning(
    stream: DataFrame,
    key_col: str = "id",
    ts_col: str = "event_ms",
    value_col: str = "temperature",
    rise_ms: int = 10_000,
) -> DataFrame:
    """T10: warn when a key's value has been strictly rising for
    >= rise_ms of event time.

    Ref: flink-base process/MyProcess.scala:11-40 — a timer is armed on
    a rise (if not already armed), cleared ONLY on a strict fall or the
    first-ever reading (scala:25-33: `< preTemp || preTemp == 0.0`),
    and fires a warning when it survives rise_ms. EQUAL consecutive
    readings neither arm nor clear — a plateau carries an armed timer
    through to firing, and the firing check happens before the
    element's own rise/fall effect (timers fire between elements), so a
    fall arriving after the deadline does not suppress the warning.
    State = (last value, armed-at ts); after a warning the timer clears
    (onTimer) and the very element that revealed the firing can re-arm
    if it is itself a rise.

    Vectorized: rise/fall flags come from one shifted compare; the scan
    then jumps between arm/disarm/fire EVENTS with searchsorted — per
    batch Python work is O(events + warns), both tiny, instead of
    O(rows) iterrows.

    Scope vs the reference: this twin is EVENT-time-driven — the
    deadline check runs when a later element of the same key reveals
    that event time passed, so a key that goes permanently silent
    emits no warning, where the reference's processing-time onTimer
    fires on wall clock regardless of further input. For silent-key
    firing, inject periodic keep-alive rows upstream (the standard
    Structured Streaming idiom for wall-clock-driven event-time
    operators) or adapt `count_with_timeout`'s ProcessingTimeTimeout
    shape.
    """
    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("warn_ms", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("rise_started_ms", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_value", T.DoubleType()),
            T.StructField("rise_start_ms", T.LongType()),
        ]
    )

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        last, rise_start = state.get if state.exists else (None, -1)
        rows = []
        pdf = _sorted_batch(pdfs, ts_col, value_col)
        if pdf is not None:
            vals = pdf[value_col].to_numpy(dtype="float64")
            ts = pdf[ts_col].to_numpy(dtype="int64")
            prevs = np.empty_like(vals)
            prevs[0] = np.nan if last is None else last
            prevs[1:] = vals[:-1]
            rising = ~np.isnan(prevs) & (vals > prevs)
            disarm = np.isnan(prevs) | (vals < prevs)  # strict fall/first
            n = len(vals)
            rise_idx = np.flatnonzero(rising)
            disarm_idx = np.flatnonzero(disarm)
            pos = 0
            while pos < n:
                if rise_start < 0:
                    # next arming rise at/after pos (disarms are no-ops
                    # while unarmed; the arming element cannot fire its
                    # own just-set timer)
                    ri = np.searchsorted(rise_idx, pos)
                    r = rise_idx[ri] if ri < len(rise_idx) else n
                    if r >= n:
                        break
                    rise_start = int(ts[r])
                    pos = r + 1
                    continue
                # armed: the timer fires at the first element whose ts
                # reaches the deadline, unless a disarm strictly precedes
                w = pos + int(np.searchsorted(ts[pos:], rise_start + rise_ms))
                di = np.searchsorted(disarm_idx, pos)
                d = disarm_idx[di] if di < len(disarm_idx) else n
                if d < w:
                    rise_start = -1  # fall before the deadline
                    pos = d + 1
                    continue
                if w >= n:
                    break  # timer survives the batch un-fired
                rows.append((str(key[0]), int(ts[w]), float(vals[w]), rise_start))
                # onTimer cleared; element w itself now processes
                rise_start = int(ts[w]) if rising[w] else -1
                pos = w + 1
            last = float(vals[-1])
        state.update((last if last is not None else 0.0, rise_start))
        yield pd.DataFrame(
            rows, columns=["key", "warn_ms", "value", "rise_started_ms"]
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
