"""Time the DuckDB oracles at a given scale factor.

Mirrors the judge's methodology: register each parquet table as a view,
run every `oracle_sql()` entry, time wall-clock per query. Prints one
JSON line {"total": s, "queries": {...}, "sf_dir": ...}.

Usage: python tools/oracle_bench.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    oracles = entrymod.oracle_sql()
    passes: list[dict[str, float]] = []
    for _ in range(runs):
        timings: dict[str, float] = {}
        for name, sql in oracles.items():
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            timings[name] = round(time.perf_counter() - t0, 4)
        passes.append(timings)
    best = {k: min(p[k] for p in passes) for k in passes[0]}
    print(
        json.dumps(
            {
                "total": round(sum(best.values()), 4),
                "pass_totals": [round(sum(p.values()), 4) for p in passes],
                "queries": best,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
