"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the
configuration below is chosen so the same logical plans scale to a
multi-executor cluster at ~100 TB:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast conversion) — replaces the reference's hand-set
  parallelism hints (reference: flink-statistics OfflineDataSetUtils.java:210,
  flink-process Hdfs2RedisVersion5.java:102).
- shuffle.partitions ~= cores locally; on a real cluster this would be
  2-3x total executor cores, but AQE coalescing makes the initial number
  far less critical than in static planning.
- session timezone pinned UTC so event-time window math is reproducible
  and comparable against the DuckDB oracle (DuckDB timestamps are
  UTC-naive). The reference's +8h day-window alignment
  (flink-statistics ActionLogJobSecond.java:226) is expressed explicitly
  as a window offset instead of an ambient JVM timezone.
- Arrow enabled: every Pandas-UDF boundary is Arrow-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "flink_project_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the tuned SparkSession.

    Note: JVM-level options (driver memory) only take effect on the first
    session created in the process.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # FAIR scheduling lets independent jobs share executor slots —
        # the bench's parallel cache-build chains and any multi-tenant
        # deployment benefit; FIFO would serialize concurrent pipelines
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # local-mode memory: single JVM, driver is the only process
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # driver testdata stores events.ts as parquet TIMESTAMP(NANOS) which
        # Spark has no native type for; read as long and normalize in
        # fixtures.load_tables (runtime-settable, so it also applies when the
        # harness hands us its own session)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    # opt-in live-Kafka tier (tests/test_kafka_live.py): pull the
    # spark-sql-kafka connector from Maven when the environment has a
    # broker + network. "1"/"true" selects the coordinate matching the
    # running pyspark; any other value is used as the coordinate
    # verbatim. Only effective on the FIRST session in the process
    # (jars are a JVM-level option), like driver memory above.
    kafka_pkg = os.environ.get("SPARK_GRAFT_KAFKA_PACKAGE")
    if kafka_pkg:
        if kafka_pkg.lower() in ("1", "true", "yes"):
            import pyspark

            # the Scala ABI suffix follows the pyspark line: Spark 4.x
            # wheels are built against Scala 2.13, Spark 3.x against
            # 2.12 — a hardcoded 2.13 would pull an ABI-incompatible
            # connector under pyspark 3.x
            major = int(pyspark.__version__.split(".")[0])
            scala = "2.13" if major >= 4 else "2.12"
            kafka_pkg = (
                f"org.apache.spark:spark-sql-kafka-0-10_{scala}:"
                + pyspark.__version__
            )
        builder = builder.config("spark.jars.packages", kafka_pkg)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def spread(df, parallelism: int | None = None):
    """Repartition a DataFrame ahead of a CPU-dense projection.

    Columnar scans parallelize by input bytes, but operators whose cost
    is per-VALUE (hashing every shingle, folding 64-dim arrays) can be
    compute-bound on a handful of scan partitions — locally a <1 MB
    parquet file is ONE partition, and on a cluster a few compressed
    row groups can starve a 1000-core job the same way. An explicit
    round-robin repartition to the session's default parallelism costs
    one tiny shuffle of the *input* rows and unlocks every core for the
    expensive projection that follows.
    """
    if parallelism is None:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
    # unconditional: the old `df.rdd.getNumPartitions() >= parallelism`
    # guard paid a full plan->RDD conversion per call and read the
    # PRE-AQE static partition count (post-shuffle frames reported
    # shuffle.partitions while AQE coalesced them to a handful at
    # runtime, so the guard skipped exactly the frames that needed
    # spreading). Callers apply spread() to small scans ahead of
    # CPU-dense projections, where the round-robin exchange is noise.
    return df.repartition(parallelism)
