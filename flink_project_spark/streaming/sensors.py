"""Sensor-stream fixture source — S7 parity.

Ref: flink-base source/SensorSource.scala:11-37 — a custom SourceFunction
emitting ('sensor_<i>', now_ms, gaussian(60, 20)) tuples. Spark has a
deterministic rate source; the Gaussian comes from a hash-seeded
Irwin-Hall transform (sum of 12 uniforms - 6 ~ N(0,1)) computed in
Column expressions — no Python in the stream path, fully reproducible
given the rate-source offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_project_spark.sources.readers import read_rate_stream


def _unit_hash(col, salt: int):
    # xxhash64 -> [0, 1) uniform. pmod, NOT abs-then-%: abs(Long.MIN)
    # stays negative in two's complement, which would leak a (rare)
    # negative "uniform" into the Gaussian sum
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1_000_000_007)).cast(
        "double"
    ) / F.lit(1_000_000_007.0)


def sensor_stream(
    spark: SparkSession,
    rows_per_second: int = 100,
    n_sensors: int = 10,
    mean: float = 60.0,
    stddev: float = 20.0,
) -> DataFrame:
    """Streaming DataFrame of (id, event_ms, temperature)."""
    rate = read_rate_stream(spark, rows_per_second)
    gauss = sum(
        [_unit_hash(F.col("value"), i) for i in range(12)], F.lit(0.0)
    ) - F.lit(6.0)
    return rate.select(
        F.concat(F.lit("sensor_"), (F.col("value") % n_sensors).cast("string")).alias(
            "id"
        ),
        F.unix_millis(F.col("timestamp")).alias("event_ms"),
        (F.lit(mean) + F.lit(stddev) * gauss).alias("temperature"),
    )
