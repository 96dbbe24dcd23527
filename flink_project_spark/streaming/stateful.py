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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def count_with_timeout(
    stream: DataFrame,
    key_col: str = "id",
    timeout_ms: int = 30_000,
) -> DataFrame:
    """T9: emit (key, count, last_seen) once a key has been silent for
    `timeout_ms` of processing time.

    Ref: flink-process myprocess/CountWithTimeoutFunction.java:14-67 —
    ValueState{count, lastModified} + a processing-time timer re-armed on
    every event; on timer fire, emit the count. Identical here: state
    carries (count, last_ts); the timeout callback fires when no new
    micro-batch contained the key within the horizon.
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
            state.remove()
            yield pd.DataFrame(
                {"key": [key[0]], "cnt": [cnt], "last_seen_ms": [last]}
            )
            return
        cnt, last = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            cnt += len(pdf)
            if "event_ms" in pdf.columns and len(pdf):
                last = max(last, int(pdf["event_ms"].max()))
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
        prev = state.get[0] if state.exists else None
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, value_col], kind="mergesort")
            for _, r in pdf.iterrows():
                cur = float(r[value_col])
                if prev is not None and abs(cur - prev) >= threshold:
                    rows.append(
                        (key[0], int(r[ts_col]), cur, prev, abs(cur - prev))
                    )
                prev = cur
        if prev is not None:
            state.update((prev,))
        yield pd.DataFrame(
            rows, columns=["key", "event_ms", "value", "prev_value", "delta"]
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

    Ref: flink-base process/MyProcess.scala:11-40 — registers a timer
    when the temperature rises vs the previous reading, clears it on a
    fall, warns when the timer survives 10 s. State = (last value,
    rise-start ts); a warning is emitted for the reading that completes
    an unbroken rising run of >= rise_ms, then the run restarts.
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
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, value_col], kind="mergesort")
            for _, r in pdf.iterrows():
                cur, ts = float(r[value_col]), int(r[ts_col])
                if last is not None and cur > last:
                    if rise_start < 0:
                        rise_start = ts
                    elif ts - rise_start >= rise_ms:
                        rows.append((key[0], ts, cur, rise_start))
                        rise_start = -1  # timer fired; re-arm on next rise
                else:
                    rise_start = -1  # fall clears the timer
                last = cur
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
