"""Driver-harness emulation: vanilla session, entry smoke, oracle compare.

Mirrors the external driver: a vanilla SparkSession (no engine conf),
`entry()` smoke at sf0.001, then every `queries()` entry vs its
`oracle_sql()` in DuckDB at sf0.01 — row count + schema + order-
insensitive value comparison. Prints one JSON line per query and a
final summary line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(df):
    import pandas as pd

    df = df[sorted(df.columns)]
    # hash-compare with rounding for floats, like the driver's value hash
    out = df.copy()
    for c in out.columns:
        if out[c].dtype.kind == "f":
            out[c] = out[c].round(6)
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def main() -> None:
    sf_small = "/root/testdata/sf0.001"
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    import __spark_entry__ as E

    n = len(E.entry(spark).collect())
    print(json.dumps({"entry_rows": n}))
    assert n > 0

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    q, o = E.queries(), E.oracle_sql()
    fails = []
    for name in q:
        try:
            sdf = q[name](spark, sf_dir).toPandas()
            if name not in o:
                print(json.dumps({"q": name, "rows": len(sdf), "oracle": None}))
                continue
            ddf = con.execute(o[name]).fetchdf()
            rows_ok = len(sdf) == len(ddf)
            schema_ok = sorted(sdf.columns) == sorted(ddf.columns)
            vals_ok = False
            if rows_ok and schema_ok:
                a, b = _norm(sdf), _norm(ddf)
                try:
                    import pandas as pd

                    vals_ok = True
                    for c in a.columns:
                        av, bv = a[c], b[c]
                        if av.dtype.kind == "f" or bv.dtype.kind == "f":
                            import numpy as np

                            if not np.allclose(
                                av.astype(float),
                                bv.astype(float),
                                rtol=1e-6,
                                atol=1e-9,
                                equal_nan=True,
                            ):
                                vals_ok = False
                        else:
                            if not (
                                av.astype(str).values == bv.astype(str).values
                            ).all():
                                vals_ok = False
                except Exception as ex:  # noqa: BLE001
                    vals_ok = False
            ok = rows_ok and schema_ok and vals_ok
            if not ok:
                fails.append(name)
            print(
                json.dumps(
                    {
                        "q": name,
                        "ok": ok,
                        "rows": [len(sdf), len(ddf)],
                        "schema": schema_ok,
                        "values": vals_ok,
                    }
                )
            )
        except Exception as ex:  # noqa: BLE001
            fails.append(name)
            print(json.dumps({"q": name, "err": str(ex)[:200]}))
    print(json.dumps({"total": len(q), "fails": fails}))


if __name__ == "__main__":
    main()
