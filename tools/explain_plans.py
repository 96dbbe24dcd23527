"""Capture `.explain("formatted")` output for declared queries.

Usage:
    python tools/explain_plans.py OUTDIR SUFFIX [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each named query (default: all
queries). Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) —
explain does not execute the query, so this is cheap, but the shared
persisted intermediates are materialized first so the captured plan is
the same InMemoryTableScan-rooted shape the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entrymod
    from flink_project_spark.session import get_spark

    spark = get_spark(app_name="fps-explain")
    # build the shared tables so plans show the bench-time shape
    for df in entrymod.shared_intermediates(spark, sf_dir).values():
        df.write.format("noop").mode("overwrite").save()

    def _cc_round_body(spark, sf_dir):
        # One CC loop-body iteration's plan (round-8 verdict ask #7):
        # the loop materializes each round behind localCheckpoint, so
        # explain on a full CC consumer only shows the last round's
        # scan — this builds the round-1 edge set of the
        # emb_semantic_dedup pair graph directly and plans ONE
        # large-star/small-star round over it, so star-contraction
        # changes carry Exchange-level evidence.
        from pyspark.sql import functions as F

        from flink_project_spark.llm.contract import _emb
        from flink_project_spark.llm.dedup import _cc_round
        from flink_project_spark.llm.similarity import embedding_near_dups

        pairs = embedding_near_dups(
            _emb(spark, sf_dir), dim=64, threshold=0.3, n_planes=4
        )
        edges0 = (
            pairs.select(F.col("vec_a").alias("u"), F.col("vec_b").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        return _cc_round(edges0)

    qs = dict(entrymod.queries())
    qs["cc_round_body"] = _cc_round_body
    for name in names or list(entrymod.queries()):
        df = qs[name](spark, sf_dir)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            ))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
