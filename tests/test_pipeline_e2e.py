"""End-to-end corpus-ingest pipeline: the operators composed the way a
production training-data build runs them.

    file-replayed document stream
      -> streaming exact dedup (bounded watermark state)
      -> quality gate (text.quality_score)
      -> deterministic split label (curation.train_split)
      -> foreachBatch parquet sink partitioned by split

The assertions close the loop against an independent BATCH computation
of the same stages over the same input: identical surviving CONTENT
set (the in-horizon dedup survivor's identity is engine-chosen),
self-consistent split labels, and a partition-pruned landed layout. This is
the integration contract — each stage is unit/oracle-tested elsewhere;
here they must compose.
"""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_project_spark.llm import curation as CUR
from flink_project_spark.llm import text as TX
from flink_project_spark.sources.readers import read_file_stream
from flink_project_spark.streaming.dedup import streaming_exact_dedup

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def _corpus(spark):
    import datetime as dt

    base = dt.datetime(2026, 3, 1, 8, 0, 0)
    rows = []
    for i in range(40):
        # every 4th doc duplicates the content of i-2 (arrives later)
        text = (
            f"doc body number {i - 2} with enough words to pass the gate "
            "the a of and to in is it padding words here now"
            if i % 4 == 3
            else f"doc body number {i} with enough words to pass the gate "
            "the a of and to in is it padding words here now"
        )
        if i % 10 == 9:
            text = "short junk"  # fails the quality gate (n_words < 10)
        rows.append((i, base + dt.timedelta(seconds=i), text))
    return spark.createDataFrame(rows, SCHEMA)


def _batch_expectation(df):
    deduped = df.withColumn("content_md5", F.md5("text")).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("content_md5").orderBy("ts", "doc_id")
        ),
    ).filter(F.col("_rn") == 1).drop("_rn")
    q = TX.quality_score(
        deduped.withColumn("source", F.lit("stream"))
    ).select("doc_id", "quality")
    kept = deduped.join(q.filter(F.col("quality") >= 0.5), "doc_id")
    return CUR.train_split(kept).select("doc_id", "split")


def test_ingest_pipeline_stream_matches_batch(spark, tmp_path):
    src_dir = tmp_path / "incoming"
    out_dir = tmp_path / "landed"
    ckpt = tmp_path / "ckpt"
    corpus = _corpus(spark)
    # replay in two file drops (two micro-batches at latestFirst=false)
    corpus.filter(F.col("doc_id") < 20).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src_dir))
    corpus.filter(F.col("doc_id") >= 20).coalesce(1).write.mode(
        "append"
    ).parquet(str(src_dir))

    stream = read_file_stream(spark, str(src_dir), SCHEMA)
    deduped = streaming_exact_dedup(stream, horizon="10 minutes")

    def land(batch_df, batch_id):
        q = TX.quality_score(
            batch_df.withColumn("source", F.lit("stream"))
        ).select("doc_id", "quality")
        kept = batch_df.join(q.filter(F.col("quality") >= 0.5), "doc_id")
        labeled = CUR.train_split(kept)
        labeled.select("doc_id", "ts", "text", "split").write.mode(
            "append"
        ).partitionBy("split").parquet(str(out_dir))

    (
        deduped.writeStream.foreachBatch(land)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )

    landed = spark.read.parquet(str(out_dir))
    rows = landed.select("doc_id", "text", "split").collect()
    got_ids = {r.doc_id for r in rows}
    # dropDuplicatesWithinWatermark keeps an ARBITRARY in-horizon
    # survivor, so assert on content identity, not which doc_id won:
    # the landed CONTENT set equals the batch-deduped content set, no
    # content lands twice, and each landed row's split label matches
    # train_split of its own doc_id.
    import hashlib

    got_contents = sorted(hashlib.md5(r.text.encode()).hexdigest() for r in rows)
    exp_rows = _batch_expectation(corpus).collect()
    exp_contents = sorted(
        hashlib.md5(r.text.encode()).hexdigest()
        for r in corpus.collect()
        if r.doc_id in {e.doc_id for e in exp_rows}
    )
    assert got_contents == exp_contents
    assert len(got_contents) == len(set(got_contents))
    relabeled = {
        r.doc_id: r.split
        for r in CUR.train_split(landed.select("doc_id")).collect()
    }
    assert all(r.split == relabeled[r.doc_id] for r in rows)
    # quality gate really dropped the junk docs, dedup really dropped dups
    assert all(d % 10 != 9 for d in got_ids)
    n_total = corpus.count()
    assert 0 < len(got_ids) < n_total
    # landed layout is split-partitioned and prunes on read
    q = landed.filter(F.col("split") == "train").select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "split" in plan.split(
        "PartitionFilters"
    )[1][:120], plan


def test_chunking_runs_in_streaming_ingest(spark, tmp_path):
    """chunk_spans is a stateless projection+generate, so the SAME
    operator body runs under Structured Streaming at ingest — the
    streamed chunk set must equal the batch chunk set over the same
    files (tokenize-at-ingest, the way chunking actually deploys)."""
    src_dir = tmp_path / "docs_in"
    corpus = _corpus(spark).select("doc_id", "ts", "text")
    corpus.coalesce(2).write.mode("overwrite").parquet(str(src_dir))

    stream = read_file_stream(spark, str(src_dir), SCHEMA)
    chunked = CUR.chunk_spans(stream, chunk_tokens=16, stride=12)
    q = (
        chunked.writeStream.format("memory")
        .queryName("chunks_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT doc_id, chunk_idx, start_tok, n_tok, chunk_md5 "
            "FROM chunks_stream"
        ).collect()
    }
    exp = {
        tuple(r)
        for r in CUR.chunk_spans(corpus, chunk_tokens=16, stride=12).collect()
    }
    assert got == exp and len(got) > 0
