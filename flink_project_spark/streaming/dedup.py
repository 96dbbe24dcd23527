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
