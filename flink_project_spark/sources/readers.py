"""Batch & streaming sources — SURVEY.md §2.1 (S1-S10).

Each function covers a source the reference implements by hand; here each
is a thin declarative wrapper so Catalyst/DSv2 keeps pushdown, partition
pruning and codec handling. The reference's 90-LoC custom Snappy input
format (flink-process readsnappy/HdfsSnappyFileInputFormat.java:11-29) and
its existence-gated partition-union loops (flink-itemcf
ItemIdCfVersion5.java:87-110, flink-statistics OfflineJob.java:117-145)
collapse into Spark's built-in codec chain and glob/partition discovery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_text(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """S1: line-oriented text scan. Ref: flink-base wc/WorldCount.scala:17.

    Also S3: Hadoop-codec-compressed text (`.snappy`, `.gz`) decompresses
    transparently through the same reader (ref: flink-process
    readsnappy/*.java — custom code that Spark does not need).
    """
    return spark.read.text(path)


def read_text_recursive(spark: SparkSession, directory: str) -> DataFrame:
    """S2: recursive multi-directory scan.

    Ref: flink-process source/ReadMultiDirectory.java:13-16
    (`recursive.file.enumeration=true`).
    """
    return spark.read.option("recursiveFileLookup", "true").text(directory)


def read_partitioned_text(spark: SparkSession, paths: list[str]) -> DataFrame:
    """S4: multi-partition union scan.

    The reference loops day/hour dirs, checks fs.exists, and unions
    (ItemIdCfVersion5.java:87-110). Spark takes the path list directly,
    but a path missing at PLAN time still raises PATH_NOT_FOUND
    (ignoreMissingFiles only forgives files deleted after listing), so
    the existence probe survives here — one driver-side Hadoop
    globStatus call per candidate path (a few dozen day/hour dirs, not
    data; globStatus, NOT exists, so glob patterns like 'day=2024*'
    keep working exactly as spark.read.text expands them). On parquet
    tables, Hive-style partition discovery + partition-filter pruning
    replaces the manual loop entirely.
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    existing = []
    for p in paths:
        hp = jvm.org.apache.hadoop.fs.Path(p)
        matches = hp.getFileSystem(conf).globStatus(hp)
        if matches is not None and len(matches) > 0:
            existing.append(p)
    if not existing:
        return spark.createDataFrame(
            [], T.StructType([T.StructField("value", T.StringType())])
        )
    return spark.read.option("ignoreMissingFiles", "true").text(existing)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, sep: str = ","
) -> DataFrame:
    """S9: CSV with explicit schema + custom delimiter.

    Ref: flink-statistics utils/OfflineDataSetUtils.java:218-224
    (CsvTableSource with '/' delimiter). Never infer schema for engine
    tables (SURVEY §1.3).
    """
    return spark.read.schema(schema).option("sep", sep).csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType,
    mode: str = "DROPMALFORMED",
) -> DataFrame:
    """JSONL corpus ingest — one JSON document per line, the de-facto
    interchange format of web-crawl corpora; `.gz`/`.snappy` files
    decompress transparently through the same codec chain as S3.

    Explicit schema, never inferred (inference scans the data twice and
    drifts across snapshots — SURVEY §1.3 applies to JSON exactly as to
    CSV); unused JSON fields are pruned AT PARSE time, so a 3-column
    projection of a 40-field crawl record never materializes the rest.
    `mode`: DROPMALFORMED (default — crawl JSONL always carries some
    corrupt lines; they vanish here, mirroring the reference's
    parse-and-drop flatMap, P2), PERMISSIVE (corrupt rows become nulls;
    add a `_corrupt_record` string field to the schema to retain the
    raw line for a quarantine sink), or FAILFAST.
    """
    return spark.read.schema(schema).option("mode", mode).json(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    query: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S8: JDBC source. Ref: flink-process source/SourceFromMysql.java:12-85.

    The reference hand-rolls a RichSourceFunction running one SELECT; the
    JDBC DSv2 source additionally gives predicate pushdown and
    partitioned parallel reads (partitionColumn/lowerBound/upperBound).
    """
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan with filter/column pushdown — the engine's native format."""
    return spark.read.parquet(path)


# --------------------------- streaming sources -----------------------------


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    group_id: str | None = None,
) -> DataFrame:
    """S6: Kafka consumer stream.

    Ref: flink-base source/KafkaSource.scala:24-26, flink-process
    source/FlinkSourceUtils.java:11-18 (FlinkKafkaConsumer010 with
    latest/group offsets — T14). Offset tracking rides the streaming
    checkpoint (exactly-once with idempotent sinks).
    Requires the spark-sql-kafka package on the classpath.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if group_id:
        reader = reader.option("kafka.group.id", group_id)
    return reader.load()


#: the fixed schema the Kafka DSv2 source emits — any frame with this
#: shape can stand in for a live topic (file-replayed in tests, since
#: the sandbox has no broker)
KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def as_kafka_records(
    df: DataFrame,
    topic: str,
    ts_col: str,
    key_col: str | None = None,
    n_partitions: int = 3,
) -> DataFrame:
    """Render a row frame in Kafka's wire shape: every payload column
    JSON-encoded into the binary `value`, plus topic/partition/offset/
    timestamp metadata.

    The test-side twin of `read_kafka_stream`: what a producer would
    publish (ref: flink-base source/KafkaSource.scala:28-30) and exactly
    what the Kafka source would hand back, so the parse chain
    (`parse_kafka_json`) is exercised unchanged against file-replayed
    data. Partition is a deterministic key hash — or, KEYLESS, a
    deterministic hash over the row's payload columns, so records
    spread across all `n_partitions` the way a keyless producer's
    round-robin does (hashing the constant topic would land every row
    in ONE partition and silently test a degenerate layout); offset is
    a per-partition row_number — all reproducible.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    payload = [c for c in df.columns]
    key = (
        F.col(key_col).cast("string").cast("binary")
        if key_col
        else F.lit(None).cast("binary")
    )
    part_src = (
        F.xxhash64(F.col(key_col))
        if key_col
        else F.xxhash64(*[F.col(c) for c in payload])
    )
    part = F.pmod(part_src, F.lit(n_partitions)).cast("int")
    out = df.select(
        key.alias("key"),
        F.to_json(F.struct(*payload)).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        part.alias("partition"),
        F.col(ts_col).cast("timestamp").alias("timestamp"),
    )
    # total order: timestamp ties break on the serialized value, so the
    # (offset -> record) pairing is reproducible under any shuffle/AQE
    # plan (the determinism the docstring promises)
    w = Window.partitionBy("partition").orderBy("timestamp", "value")
    return out.select(
        "key",
        "value",
        "topic",
        "partition",
        (F.row_number().over(w).cast("long") - 1).alias("offset"),
        "timestamp",
        F.lit(0).alias("timestampType"),
    )


def parse_kafka_json(
    kafka_df: DataFrame,
    schema: T.StructType | str,
    required_field: str | None = None,
) -> DataFrame:
    """S6→P1/P2: decode a Kafka record frame's JSON `value` payload.

    Ref: flink-statistics action/ActionLogJob.java:116-127 — map JSON
    string -> ActionLog POJO, corrupt rows dropped (the filter
    replicates the reference's emit-or-skip flatMap). from_json in
    PERMISSIVE mode renders an unparseable payload as a struct of
    nulls, so pass `required_field` (a column every real record
    carries) to drop corrupt records the way the reference does.
    Works identically on the live `read_kafka_stream` output and on a
    file-replayed `as_kafka_records` frame; `kafka_ts` (the broker
    append time) rides along for processing-time uses.
    """
    from pyspark.sql import functions as F

    parsed = kafka_df.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r"),
        F.col("timestamp").alias("kafka_ts"),
    )
    cond = F.col("r").isNotNull()
    if required_field:
        cond = cond & F.col(f"r.{required_field}").isNotNull()
    return parsed.filter(cond).select("r.*", "kafka_ts")


def read_socket_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S5: socket text stream (dev only). Ref: StreamWorldCount.scala:13."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def read_file_stream(
    spark: SparkSession, directory: str, schema: T.StructType, fmt: str = "parquet"
) -> DataFrame:
    """S10: continuous file-directory stream.

    Ref: flink-process main/ReadFileContinue.java:12. Also the replay
    source for stream-batch equivalence tests (SURVEY §5).
    """
    return spark.readStream.format(fmt).schema(schema).load(directory)


def read_rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """S7: generator source (test fixture).

    Ref: flink-base source/SensorSource.scala:11-37 (random Gaussian
    sensor readings). The deterministic rate source + a select transform
    replaces the custom SourceFunction; see streaming.sensors for the
    Gaussian mapping.
    """
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
