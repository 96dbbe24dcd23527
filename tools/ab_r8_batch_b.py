"""Round-8 interleaved A/B: item-CF pair-stream halving (canonical i<j
slice + post-agg explode) and neighbor-list totals-fold, old vs new at
sf0.1, same session. Outputs compared exactly before timing is trusted.

Usage: python tools/ab_r8_batch_b.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as E
    from flink_project_spark.operators import itemcf as CF
    from flink_project_spark.operators.setops import top_k_per_group
    from flink_project_spark.session import get_spark

    spark = get_spark(app_name="ab-r8-batch-b")
    sc = spark.sparkContext

    arrays = E._history_arrays(spark, sf_dir)
    arrays.write.format("noop").mode("overwrite").save()

    # ---- old pair build (full n^2 directed generate) --------------------
    def pairs_old():
        lut_vals = CF.decay_lut()
        lut = CF._lut_expr(lut_vals)
        max_d = len(lut_vals)
        ex1 = arrays.select(
            "user_id", "items", F.posexplode("items").alias("i", "sa")
        )
        ex2 = ex1.select(
            "user_id",
            F.col("sa.it").alias("item_a"),
            F.col("i").alias("pa"),
            F.posexplode("items").alias("j", "sb"),
        )
        d = F.abs(F.col("pa") - F.col("j"))
        return (
            ex2.filter(F.col("item_a") != F.col("sb.it"))
            .select(
                "item_a",
                F.col("sb.it").alias("item_b"),
                F.element_at(
                    lut, F.least(d, F.lit(max_d)).cast("int")
                ).alias("w_scaled"),
            )
            .groupBy("item_a", "item_b")
            .agg(
                F.count(F.lit(1)).alias("cooc"),
                F.sum("w_scaled").alias("decay_scaled"),
            )
            .withColumn(
                "decay_score",
                F.col("decay_scaled").cast("double") / F.lit(1e6),
            )
        )

    def pairs_new():
        return CF.decay_pairs_from_arrays(arrays)

    op = sorted(map(tuple, pairs_old().collect()))
    np_ = sorted(map(tuple, pairs_new().collect()))
    print(f"pairs rows old={len(op)} new={len(np_)} identical={op == np_}")
    assert op == np_

    # ---- lists: old (totals groupBy + join) vs new (window fold) --------
    cosine = E._cosine(spark, sf_dir)
    cosine.write.format("noop").mode("overwrite").save()

    def lists_old():
        scored = cosine
        totals = scored.groupBy("item_a").agg(
            F.count(F.lit(1)).alias("_total")
        )
        neg = scored.withColumn("_neg", -F.col("score"))
        cut = top_k_per_group(
            neg, ["item_a"], ["_neg", "item_b"], 10
        ).drop("_neg")
        entry = F.struct(
            (-F.col("score")).alias("neg_score"),
            F.col("item_b").alias("nb"),
        )
        lists = (
            cut.groupBy("item_a")
            .agg(
                F.sort_array(F.collect_list(entry), asc=True).alias(
                    "entries"
                )
            )
            .join(totals, "item_a")
        )
        rendered = F.array_join(
            F.transform(
                F.col("entries"),
                lambda x: F.concat(
                    x["nb"],
                    F.lit(":"),
                    F.format_string("%.6f", -x["neg_score"]),
                ),
            ),
            ",",
        )
        return lists.select(
            F.col("item_a").alias("item_id"),
            rendered.alias("neighbors"),
            F.size("entries").alias("n_neighbors"),
            F.col("_total").alias("total_candidates"),
        )

    def lists_new():
        return CF.neighbor_lists(cosine, k=10)

    ol = sorted(map(tuple, lists_old().collect()))
    nl = sorted(map(tuple, lists_new().collect()))
    print(f"lists rows old={len(ol)} new={len(nl)} identical={ol == nl}")
    assert ol == nl

    def run(fn, group, tag):
        sc.setJobGroup(f"{group}:{tag}", tag)
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(f"{group}:{tag}"))
        return dt, jobs

    pt = {"old": [], "new": []}
    lt = {"old": [], "new": []}
    pj = {}
    lj = {}
    for i in range(reps):
        for tag, fn in (("old", pairs_old), ("new", pairs_new)):
            dt, jobs = run(fn, "pairs", f"{tag}{i}")
            pt[tag].append(round(dt, 3))
            pj[tag] = jobs
        for tag, fn in (("old", lists_old), ("new", lists_new)):
            dt, jobs = run(fn, "lists", f"{tag}{i}")
            lt[tag].append(round(dt, 3))
            lj[tag] = jobs
    print("pairs times old", pt["old"], "min", min(pt["old"]))
    print("pairs times new", pt["new"], "min", min(pt["new"]))
    print("pairs jobs  old", pj["old"], "new", pj["new"])
    print("lists times old", lt["old"], "min", min(lt["old"]))
    print("lists times new", lt["new"], "min", min(lt["new"]))
    print("lists jobs  old", lj["old"], "new", lj["new"])
    spark.stop()


if __name__ == "__main__":
    main()
