"""Structured Streaming parity layer — SURVEY §2.8 (T1-T14).

The reference's 600-LoC hand-rolled window/state machinery
(flink-statistics ActionLogJob/ActionLogJobSecond) collapses into
watermark + window aggregations; the KeyedProcessFunction family
(timers, ValueState) maps to applyInPandasWithState.
"""
