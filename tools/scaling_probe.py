"""Scale-factor sweep: time a set of headline queries at sf0.001 /
sf0.01 / sf0.1 and report per-query scaling exponents.

Evidence for the 100 TB story: a query whose cost is dominated by
per-row work and bounded shuffles should scale ~linearly in rows
(exponent ~1 between SFs once above the fixed per-query floor); a
quadratic or driver-bound plan shows up as an exponent near 2. The
fixed local-mode floor (~0.2-0.5 s/query) dominates at sf0.001, so the
meaningful exponent is the sf0.01 -> sf0.1 step (100x fewer fixed-cost
artifacts than real work at sf0.1).

Usage: python tools/scaling_probe.py [q1,q2,...] [runs]
Prints one JSON line: {"queries": {name: {"sf0.001": s, ...,
"exp_01_to_1": e}}, "rows": {...}}.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

DEFAULT = [
    "pricing_summary",
    "multi_resolution_counts",
    "itemcf_decay",
    "doc_minhash_neardups",
    "doc_simhash_neardups",
    "emb_near_dups",
    "doc_rarity",
    "regional_supplier_volume",
    "event_funnel",
    "doc_chunks",
]


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else DEFAULT
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from flink_project_spark import cache as CACHE
    from flink_project_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark(app_name="scaling-probe")
    q = E.queries()
    out: dict[str, dict[str, float]] = {}
    rowcounts: dict[str, int] = {}

    for sf_dir in SFS:
        sf_key = os.path.basename(sf_dir)
        # pre-build the shared intermediates so per-query times measure
        # the query at each SF (mirrors bench.py's cache-build phase)
        for df in E.shared_intermediates(spark, sf_dir).values():
            df.write.format("noop").mode("overwrite").save()
        import pyspark.sql.functions as F  # noqa: F401

        rowcounts[sf_key] = (
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
        )
        for name in names:
            best = math.inf
            for _ in range(runs):
                t0 = time.perf_counter()
                q[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            out.setdefault(name, {})[sf_key] = round(best, 4)
        CACHE.clear(spark)

    for name, d in out.items():
        lo, hi = d.get("sf0.01"), d.get("sf0.1")
        if lo and hi and lo > 0:
            d["exp_01_to_1"] = round(math.log(hi / lo) / math.log(10), 3)
    print(json.dumps({"queries": out, "lineitem_rows": rowcounts}))


if __name__ == "__main__":
    main()
