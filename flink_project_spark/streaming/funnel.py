"""Streaming funnel analysis — the foreachBatch twin of
`operators.funnel.funnel_times`.

A funnel is not a single incremental aggregation: a LATE step-1 event
can rewrite every downstream step time for its user (t2..tk all depend
on t1), so no forward-only per-user state is exact under out-of-order
arrival — the full step-relevant event history IS the minimal exact
state. The streaming twin therefore follows the signature-store pattern
of `streaming.dedup.near_dup_dedup_batch`: each micro-batch lands its
step-relevant events (filtered to the funnel's event types, pruned to
(user, type, ts)) as ONE ``batch=<id>`` partition in OVERWRITE mode —
replay-idempotent, a retried batch rewrites its own partition — then
the batch operator recomputes `funnel_times` over the accumulated
store and hands the refreshed per-user times to the sink
(complete-output semantics: every emission is the exact result over
everything seen so far, equal to the batch operator on the same
events — the equivalence the test pins, independent of batch slicing
and arrival order).

Scale: the store holds only funnel-relevant events (type filter +
3-column projection applied before landing), and production bounds it
the standard way — partition the store by event date and drop
partitions past the analysis horizon; the recompute is k
filtered passes over that bounded store, the batch operator's own
documented shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_project_spark.operators.funnel import funnel_times


def funnel_batch(
    batch: DataFrame,
    store_dir: str,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon_seconds: int | None = None,
    batch_id: int = 0,
) -> DataFrame:
    """One micro-batch of streaming funnel maintenance: land this
    batch's step-relevant events as the ``batch=<id>`` store partition
    (overwrite — replay-idempotent), then return the exact
    `funnel_times` over the whole accumulated store."""
    rel = batch.filter(F.col(type_col).isin(list(steps))).select(
        user_col, type_col, ts_col
    )
    rel.write.mode("overwrite").parquet(f"{store_dir}/batch={batch_id}")
    spark = batch.sparkSession
    # The batch partition was just written above, so the store dir is
    # guaranteed to exist — a read failure here can only signal a real
    # defect (schema conflict, corruption, permissions) and must RAISE
    # rather than silently degrade to this-batch-only output, which
    # would break the complete-output contract (same hardening as
    # streaming.dedup.near_dup_dedup_batch's store path).
    all_events = spark.read.parquet(store_dir).select(
        user_col, type_col, ts_col
    )
    return funnel_times(
        all_events,
        steps,
        user_col=user_col,
        type_col=type_col,
        ts_col=ts_col,
        horizon_seconds=horizon_seconds,
    )


def retention_batch(
    batch: DataFrame,
    store_dir: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    batch_id: int = 0,
) -> DataFrame:
    """One micro-batch of streaming cohort-retention maintenance.

    The store lands each batch's DISTINCT (user, period-bucket) pairs —
    the sufficient statistic for `cohort_retention` (the matrix is
    computed from exactly that projection: cohort = min bucket per
    user, then distinct pair counting), so state is bounded by
    |users| x |periods| rather than the raw event volume, and the
    recompute over the accumulated pairs is EXACT under any arrival
    order (a late first-period event re-anchors its user's cohort on
    the next emission). Same ``batch=<id>`` overwrite layout as
    `funnel_batch` — replay-idempotent."""
    from flink_project_spark.operators.funnel import cohort_retention

    bucket = F.date_trunc(period, F.col(ts_col)).cast("date")
    rel = batch.select(
        F.col(user_col).alias("u"), bucket.alias("p")
    ).distinct()
    rel.write.mode("overwrite").parquet(f"{store_dir}/batch={batch_id}")
    spark = batch.sparkSession
    # Store dir just written — exists by construction; real read
    # failures raise (see funnel_batch).
    pairs = spark.read.parquet(store_dir).select("u", "p")
    # buckets are already period-truncated dates, so feeding them back
    # through cohort_retention's date_trunc is idempotent
    return cohort_retention(
        pairs.select(F.col("u").alias(user_col), F.col("p").alias(ts_col)),
        user_col=user_col,
        ts_col=ts_col,
        period=period,
    )


def retention_foreach_batch(
    store_dir: str,
    sink,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
):
    """foreachBatch wiring for `retention_batch`: ``sink(matrix_df,
    batch_id)`` receives the refreshed cohort matrix after each batch
    (complete-output semantics, idempotent per batch_id for an
    overwriting sink)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sink(
            retention_batch(
                batch_df,
                store_dir,
                user_col=user_col,
                ts_col=ts_col,
                period=period,
                batch_id=batch_id,
            ),
            batch_id,
        )

    return _process


def funnel_foreach_batch(
    store_dir: str,
    sink,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon_seconds: int | None = None,
):
    """foreachBatch wiring: returns the (batch_df, batch_id) callable;
    ``sink(times_df, batch_id)`` receives the refreshed per-user funnel
    times after each batch (complete-output semantics — idempotent per
    batch_id as long as the sink overwrites, the standard foreachBatch
    contract)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sink(
            funnel_batch(
                batch_df,
                store_dir,
                steps,
                user_col=user_col,
                type_col=type_col,
                ts_col=ts_col,
                horizon_seconds=horizon_seconds,
                batch_id=batch_id,
            ),
            batch_id,
        )

    return _process
