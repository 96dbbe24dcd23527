"""Streaming ingest deduplication for document corpora.

A training-data pipeline dedups AT INGEST so duplicates never reach
storage: every arriving document is content-hashed and dropped if the
same hash was seen within the watermark horizon. This is the streaming
twin of ``llm.dedup.exact_dedup_groups`` (batch md5 groupBy), built on
Structured Streaming's ``dropDuplicatesWithinWatermark`` so the dedup
state is BOUNDED — hashes older than the watermark are evicted, which
is what makes the operator runnable forever at 100 TB/day (an unbounded
``dropDuplicates`` would accumulate one state row per distinct document
for the lifetime of the stream).

Semantics vs the batch operator: within one watermark horizon the
result is identical (first arrival survives); re-occurrences farther
apart than the horizon are re-admitted — the standard
bounded-state trade-off, surfaced as the ``horizon`` parameter rather
than hidden. Cross-horizon exactness belongs to the batch pass
(``exact_dedup_groups``) that compacts the landed corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Drop documents whose content md5 already arrived within
    ``horizon`` event time.

    One narrow state key (32-byte hash + timestamp) per distinct
    in-horizon document; the payload column never enters state. Works
    on batch frames too, where the survivor is picked
    DETERMINISTICALLY — the earliest (ts, then remaining columns) row
    per hash — because ``dropDuplicates`` keeps whichever duplicate a
    partition scan meets first and would flip under AQE/repartition
    re-plans; the streaming path's first-ARRIVAL survivor is inherently
    arrival-order-dependent, so equivalence checks compare content
    sets, not survivor identity (see tests/test_pipeline_e2e.py).
    """
    hashed = stream.withColumn("content_md5", F.md5(F.col(text_col)))
    if hashed.isStreaming:
        return hashed.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
            ["content_md5"]
        )
    from pyspark.sql.window import Window

    # deterministic total order: ts first, then every ORDERABLE column
    # (map columns have no sort order in Spark and would fail the
    # window; frames whose only distinguishing columns are maps fall
    # back to ts-order, still deterministic per timestamp)
    orderable = [
        c
        for c, t in hashed.dtypes
        if c not in ("content_md5", ts_col) and not t.startswith("map")
    ]
    w = Window.partitionBy("content_md5").orderBy(ts_col, *orderable)
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def near_dup_dedup_batch(
    batch: DataFrame,
    store_dir: str,
    text_col: str = "text",
    ts_col: str = "ts",
    id_col: str = "doc_id",
    horizon_seconds: int = 600,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """One micro-batch of streaming NEAR-dup dedup (SimHash banding).

    Admission rule — deterministic and batch-boundary-independent: a
    document survives iff NO earlier arrival (by (ts, id), across all
    prior batches within the horizon AND earlier rows of this batch)
    has a simhash within ``max_hamming``. "Earlier arrival" counts
    dropped documents too: the signature store records EVERY arrival,
    not just survivors, so re-slicing the same stream into different
    micro-batches yields the identical admitted set (the property the
    replay test pins). Like the batch `dedup_keep_canonical`
    single-link rule, chains over-remove (B drops for A, C drops for
    B): the compaction pass with mode="cc" is the principled
    cross-horizon twin.

    State: (simhash, ts) pairs — two longs per in-horizon arrival,
    loaded per batch with an event-time cutoff filter. This module
    keeps it as a parquet directory appended per batch; the cluster
    analog is an hourly-partitioned store where horizon eviction is a
    partition DROP, not a filter. Matching against the store is the
    banded `simhash_cross_matches` equi-join — never batch x store.
    """
    from pyspark.sql.utils import AnalysisException

    from flink_project_spark.llm.dedup import (
        doc_simhash,
        simhash_cross_matches,
        simhash_near_dups,
    )

    if batch.isEmpty():
        return batch.limit(0)
    spark = batch.sparkSession
    sim = doc_simhash(
        batch.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        text_col=text_col,
        bits=bits,
    ).join(
        batch.select(
            F.col(id_col).alias("doc_id"), F.col(ts_col).alias("_ts")
        ),
        "doc_id",
    )
    sim = sim.persist()
    try:
        ref = spark.read.parquet(store_dir)
    except AnalysisException:
        ref = None
    if ref is not None:
        cutoff = batch.agg(
            F.max(F.col(ts_col)) - F.expr(f"INTERVAL {horizon_seconds} SECONDS")
        ).collect()[0][0]
        ref = ref.filter(F.col("_ts") >= F.lit(cutoff))
        store_hits = simhash_cross_matches(
            sim, ref, bits=bits, bands=bands, max_hamming=max_hamming
        )
    else:
        store_hits = None
    # in-batch: orient near-dup pairs by arrival order (ts, then id) —
    # the later side of any pair is dropped
    pairs = simhash_near_dups(
        sim, bits=bits, bands=bands, max_hamming=max_hamming
    )
    ts_of = sim.select("doc_id", "_ts")
    oriented = (
        pairs.join(
            ts_of.select(
                F.col("doc_id").alias("doc_a"), F.col("_ts").alias("ts_a")
            ),
            "doc_a",
        )
        .join(
            ts_of.select(
                F.col("doc_id").alias("doc_b"), F.col("_ts").alias("ts_b")
            ),
            "doc_b",
        )
        .select(
            F.when(
                (F.col("ts_a") < F.col("ts_b"))
                | (
                    (F.col("ts_a") == F.col("ts_b"))
                    & (F.col("doc_a") < F.col("doc_b"))
                ),
                F.col("doc_b"),
            )
            .otherwise(F.col("doc_a"))
            .alias("doc_id")
        )
        .distinct()
    )
    losers = (
        oriented if store_hits is None else oriented.union(store_hits).distinct()
    )
    survivors = batch.join(
        losers.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )
    # record EVERY arrival's signature (see docstring) — two longs/row
    sim.select(
        "simhash", F.col("_ts").alias("_ts")
    ).write.mode("append").parquet(store_dir)
    sim.unpersist()
    return survivors


def near_dup_foreach_batch(
    store_dir: str,
    sink,
    text_col: str = "text",
    ts_col: str = "ts",
    id_col: str = "doc_id",
    horizon_seconds: int = 600,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
):
    """foreachBatch wiring for `near_dup_dedup_batch`: returns the
    (batch_df, batch_id) callable; ``sink(survivors_df, batch_id)``
    receives each batch's admitted documents. Pair with a checkpointed
    writeStream — the signature-store append is idempotent only per
    batch file, so exactly-once delivery relies on the checkpoint
    replaying whole batches (the standard foreachBatch contract)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        survivors = near_dup_dedup_batch(
            batch_df,
            store_dir,
            text_col=text_col,
            ts_col=ts_col,
            id_col=id_col,
            horizon_seconds=horizon_seconds,
            bits=bits,
            bands=bands,
            max_hamming=max_hamming,
        )
        sink(survivors, batch_id)

    return _process


def curation_foreach_batch(
    store_dir: str,
    sink,
    gate=None,
    **near_dup_kwargs,
):
    """Streaming-ingest curation: per micro-batch, apply ``gate`` (any
    DataFrame -> DataFrame filter stage — a quality-score threshold, a
    `text.heuristic_rules` keep-flag filter, a PII gate), then near-dup
    admission against the horizon-bounded signature store;
    ``sink(survivors_df, batch_id)`` receives each batch's curated
    documents. `near_dup_kwargs` pass through to
    `near_dup_foreach_batch` (horizon_seconds, bands, ...).

    Composition contract (tested): the admitted set equals running the
    same gate + `near_dup_dedup_batch` over the same arrivals in the
    same order — gating upstream of admission also keeps REJECTED docs
    out of the signature store, so a near-dup of junk is judged against
    the curated corpus only, exactly as the batch funnel
    (`llm.pipeline.curate_corpus`) orders its stages.
    """
    inner = near_dup_foreach_batch(store_dir, sink, **near_dup_kwargs)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        gated = gate(batch_df) if gate is not None else batch_df
        inner(gated, batch_id)

    return _process
