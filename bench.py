"""Benchmark harness — times the engine's headline queries.

Runs every entry in ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes end-to-end through the `noop` sink (full plan, no
driver-side collection) — the number measures engine throughput, not
toPandas serialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    import __spark_entry__ as entrymod
    from flink_project_spark.session import get_spark

    spark = get_spark(app_name="fps-bench")

    # JVM warmup covering the machinery every query touches (codegen,
    # shuffle, broadcast) so q1 isn't charged for first-use initialization
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # Cache-build phase: materialize the shared persisted intermediates
    # once, timed separately, so per-query numbers measure the query
    # rather than whichever chain build it happens to trigger first.
    # The build time is INCLUDED in the reported total (value) — the
    # split only makes attribution honest, it doesn't hide the cost.
    t0 = time.perf_counter()
    for df in entrymod.shared_intermediates(spark, sf_dir).values():
        df.write.format("noop").mode("overwrite").save()
    cache_build = round(time.perf_counter() - t0, 4)

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()) + cache_build, 4)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "cache_build_seconds": cache_build,
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
