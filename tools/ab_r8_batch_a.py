"""Round-8 interleaved A/B: CC observed-metrics convergence + uauc
single-pass fusion, old vs new at sf0.1.

Old arms are reconstructed inline from the still-present building
blocks (`_cc_round` + the lazy-checkpoint/agg signature loop;
`auc_from_counts` + `_weighted_user_mean`), so both arms run in the
same session minutes apart — robust to the host's uniform steal mode.
Outputs are compared exactly before any timing is trusted.

Usage: python tools/ab_r8_batch_a.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as E
    from flink_project_spark.llm import dedup as DD
    from flink_project_spark.llm.contract import _emb
    from flink_project_spark.llm.similarity import embedding_near_dups
    from flink_project_spark.operators import auc as A
    from flink_project_spark.session import get_spark

    spark = get_spark(app_name="ab-r8-batch-a")
    sc = spark.sparkContext

    # shared caches once, like the bench build phase
    for df in E.shared_intermediates(spark, sf_dir).values():
        df.write.format("noop").mode("overwrite").save()

    # ---- CC arms -------------------------------------------------------
    def cc_old(pairs, a_col, b_col, max_rounds=50):
        edges = (
            pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        prev_sig = None
        for _ in range(max_rounds):
            edges = DD._cc_round(edges).localCheckpoint(eager=False)
            row = edges.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(2147483647))),
                    F.lit(0),
                ).alias("h"),
            ).collect()[0]
            sig = (row["n"], row["h"])
            if sig == prev_sig:
                break
            prev_sig = sig
        comp = edges.select(
            F.col("u").alias("doc_id"), F.col("v").alias("component")
        )
        roots = (
            edges.select(F.col("v").alias("doc_id"))
            .distinct()
            .withColumn("component", F.col("doc_id"))
        )
        return comp.union(roots).groupBy("doc_id").agg(
            F.min("component").alias("component")
        )

    emb = _emb(spark, sf_dir)
    pairs = embedding_near_dups(emb, dim=64, threshold=0.3, n_planes=4)

    def run_cc(fn, tag):
        sc.setJobGroup(f"cc:{tag}", tag)
        t0 = time.perf_counter()
        out = fn(pairs, "vec_a", "vec_b")
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(f"cc:{tag}"))
        return dt, jobs

    # results identical?
    old_rows = sorted(map(tuple, cc_old(pairs, "vec_a", "vec_b").collect()))
    new_rows = sorted(
        map(tuple, DD.connected_components(pairs, "vec_a", "vec_b").collect())
    )
    print(
        f"cc rows old={len(old_rows)} new={len(new_rows)} "
        f"identical={old_rows == new_rows}"
    )
    assert old_rows == new_rows

    # ---- uauc arms -----------------------------------------------------
    counts = E._auc_counts(spark, sf_dir).filter(F.col("channel") == "all")

    def uauc_old():
        per_user = A.auc_from_counts(
            counts.filter(F.col("score").isNotNull()),
            ["scene_id", "user_id"],
            "score",
        )
        weights = counts.groupBy("scene_id", "user_id").agg(
            F.sum("w_s").alias("w")
        )
        return A._weighted_user_mean(
            per_user, weights, ["scene_id"], "user_id"
        )

    def uauc_new():
        return A.uauc_from_counts(
            counts, ["scene_id"], user_col="user_id", weight_col="w_s"
        )

    ou = sorted(map(tuple, uauc_old().collect()))
    nu = sorted(map(tuple, uauc_new().collect()))
    print(f"uauc rows old={len(ou)} new={len(nu)} identical={ou == nu}")
    assert ou == nu

    def run_uauc(fn, tag):
        sc.setJobGroup(f"uauc:{tag}", tag)
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(f"uauc:{tag}"))
        return dt, jobs

    cc_t = {"old": [], "new": []}
    uauc_t = {"old": [], "new": []}
    cc_jobs = {}
    uauc_jobs = {}
    for i in range(reps):
        for tag, fn in (("old", cc_old), ("new", DD.connected_components)):
            dt, jobs = run_cc(fn, f"{tag}{i}")
            cc_t[tag].append(round(dt, 3))
            cc_jobs[tag] = jobs
        for tag, fn in (("old", uauc_old), ("new", uauc_new)):
            dt, jobs = run_uauc(fn, f"{tag}{i}")
            uauc_t[tag].append(round(dt, 3))
            uauc_jobs[tag] = jobs
    print("cc times      old", cc_t["old"], "min", min(cc_t["old"]))
    print("cc times      new", cc_t["new"], "min", min(cc_t["new"]))
    print("cc jobs/run   old", cc_jobs["old"], "new", cc_jobs["new"])
    print("uauc times    old", uauc_t["old"], "min", min(uauc_t["old"]))
    print("uauc times    new", uauc_t["new"], "min", min(uauc_t["new"]))
    print("uauc jobs/run old", uauc_jobs["old"], "new", uauc_jobs["new"])
    spark.stop()


if __name__ == "__main__":
    main()
