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
    (ItemIdCfVersion5.java:87-110). Spark takes the path list directly and
    skips missing ones; on parquet tables, Hive-style partition discovery +
    partition-filter pruning replaces the manual loop entirely.
    """
    return (
        spark.read.option("pathGlobFilter", "*")
        .option("ignoreMissingFiles", "true")
        .text(paths)
    )


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, sep: str = ","
) -> DataFrame:
    """S9: CSV with explicit schema + custom delimiter.

    Ref: flink-statistics utils/OfflineDataSetUtils.java:218-224
    (CsvTableSource with '/' delimiter). Never infer schema for engine
    tables (SURVEY §1.3).
    """
    return spark.read.schema(schema).option("sep", sep).csv(path)


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
