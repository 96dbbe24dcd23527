"""Round-8 A/B: doc_language_id stopword lookup — the shipped per-word
5x isin chain vs a broadcast-join lookup against a 38-row stopword
table (one hash probe per word instead of up to 38 codegen'd string
compares). The exchange already carries per-(doc, lang) partials, so
this probes PER-TASK compute only (guide §1.2 step 2).

Usage: python tools/ab_r8_langid.py [n_reps]
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

    from flink_project_spark.llm import text as TX
    from flink_project_spark.llm.contract import _docs
    from flink_project_spark.session import get_spark

    spark = get_spark(app_name="ab-r8-langid")
    sc = spark.sparkContext
    docs = _docs(spark, sf_dir)
    docs.write.format("noop").mode("overwrite").save()

    def lang_old():
        return TX.language_id(docs)

    def lang_join():
        sw_rows = [
            (w, lang)
            for lang in sorted(TX.STOPWORDS)
            for w in TX.STOPWORDS[lang]
        ]
        sw = F.broadcast(
            spark.createDataFrame(sw_rows, "w string, sw_lang string")
        )
        wl = docs.select(
            "doc_id", "lang",
            F.explode_outer(TX.words(F.col("text"))).alias("w0"),
        ).select("doc_id", "lang", F.lower(F.col("w0")).alias("w"))
        hits = wl.join(sw, "w", "left")
        aggs = [
            F.sum(
                F.when(F.col("sw_lang") == lang, 1).otherwise(0)
            ).alias(f"h_{lang}")
            for lang in sorted(TX.STOPWORDS)
        ] + [F.count("w").alias("n")]
        per_doc = hits.groupBy("doc_id", "lang").agg(*aggs)
        nd = F.greatest(F.col("n"), F.lit(1)).cast("double")
        d = per_doc.select(
            "doc_id", "lang",
            *[
                (F.col(f"h_{lang}").cast("double") / nd).alias(f"r_{lang}")
                for lang in sorted(TX.STOPWORDS)
            ],
        )
        best = F.greatest(
            *[F.col(f"r_{lang}") for lang in sorted(TX.STOPWORDS)]
        )
        pred = F.when(best <= 0.0, F.lit("und"))
        for lang in sorted(TX.STOPWORDS):
            pred = pred.when(F.col(f"r_{lang}") == best, F.lit(lang))
        return d.select(
            "doc_id", "lang", pred.alias("pred_lang"),
            best.alias("best_ratio"),
        )

    # doc_language_id aggregates language_id to a confusion matrix; A/B
    # the underlying per-doc operator (the aggregation is identical)
    oo = sorted(map(tuple, lang_old().collect()))
    nn = sorted(map(tuple, lang_join().collect()))
    print(f"rows old={len(oo)} new={len(nn)} identical={oo == nn}")
    assert oo == nn

    def run(fn, tag):
        sc.setJobGroup(f"lid:{tag}", tag)
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(f"lid:{tag}"))
        return dt, jobs

    t = {"old": [], "join": []}
    j = {}
    for i in range(reps):
        for tag, fn in (("old", lang_old), ("join", lang_join)):
            dt, jobs = run(fn, f"{tag}{i}")
            t[tag].append(round(dt, 3))
            j[tag] = jobs
    print("old  times", t["old"], "min", min(t["old"]), "jobs", j["old"])
    print("join times", t["join"], "min", min(t["join"]), "jobs", j["join"])
    spark.stop()


if __name__ == "__main__":
    main()
