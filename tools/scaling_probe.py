"""Scale-factor sweep: time a set of headline queries across SF points
and report per-query scaling exponents.

Evidence for the 100 TB story: a query whose cost is dominated by
per-row work and bounded shuffles should scale ~linearly in rows
(exponent ~1 between SFs once above the fixed per-query floor); a
quadratic or driver-bound plan shows up as an exponent near 2. The
fixed local-mode floor (~0.2-0.5 s/query) dominates at small SFs, so
the meaningful exponent is the LAST decade step — by default
sf0.1 -> sf1, where sf1 is generated in-repo by
``tools/gen_scale_data.py`` (same construction as the driver data,
checked distribution-by-distribution; see that module's docstring).

Usage: python tools/scaling_probe.py [q1,q2,... | heavy | default] [runs]
Env: SPARK_GRAFT_SCALING_DIRS=dir1,dir2,... overrides the SF points.
Prints one JSON line: {"queries": {name: {"sf0.01": s, ...,
"exp_last_step": e}}, "lineitem_rows": {...}, "sf_dirs": [...]}.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _default_dirs() -> list[str]:
    dirs = [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    sf1 = os.path.join(_REPO, ".scaling", "sf1")
    if os.path.isdir(sf1):
        dirs.append(sf1)
    return dirs


def _resolve_dirs() -> list[str]:
    """SF dirs from SPARK_GRAFT_SCALING_DIRS or the defaults, with the
    duplicate-basename guard applied for EVERY mode (results are keyed
    by basename; a duplicate silently overwrites one SF point)."""
    env_dirs = os.environ.get("SPARK_GRAFT_SCALING_DIRS")
    sf_dirs = env_dirs.split(",") if env_dirs else _default_dirs()
    keys = [os.path.basename(d.rstrip("/")) for d in sf_dirs]
    if len(set(keys)) != len(keys):
        raise SystemExit(
            f"SF dirs must have distinct basenames, got {keys}"
        )
    return sf_dirs


# the ~15 heaviest plans (round-4 verdict ask #1): dedup/CC kernels,
# repetition/winnow text analysis, span dedup, the funnel/retention
# pair, item-CF, decontamination, plus pricing_summary as the
# scan+agg control
HEAVY = [
    "emb_semantic_dedup",
    "doc_dedup_cc",
    "doc_repetition",
    "doc_winnow",
    "doc_simhash_neardups",
    "doc_minhash_neardups",
    "doc_dup_spans",
    "doc_dup_span_strip",
    "emb_near_dups",
    "event_funnel",
    "event_retention",
    "itemcf_cosine",
    "itemcf_decay_gated",
    "doc_rarity",
    "doc_decontaminate_overlap",
    "media_near_dups",
    "pricing_summary",
]

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


def volumes() -> None:
    """Per-SF RESULT/MATCH volume measurements for the queries whose
    wall time grows super-linearly on the synthetic corpus — the
    evidence that separates data-volume-bound growth (work per result
    row flat) from a genuinely super-linear plan. Prints one JSON line:
    simhash true-pair counts, decontamination shingle-match volume, and
    corpus-repeated-gram occurrences per SF dir."""
    from pyspark.sql import functions as F

    from flink_project_spark.llm import dedup as DD
    from flink_project_spark.session import get_spark, spread

    sf_dirs = _resolve_dirs()
    spark = get_spark(app_name="scaling-volumes")
    out: dict[str, dict[str, int]] = {}
    for sf_dir in sf_dirs:
        key = os.path.basename(sf_dir.rstrip("/"))
        docs = spread(
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        )
        sim = DD.doc_simhash(docs).persist()
        pairs = DD.simhash_near_dups(sim).count()
        sim.unpersist()
        sc = (
            DD.shingle_hashes(docs.filter(F.col("doc_id") % 7 != 0), "text", 3)
            .groupBy("hx").agg(F.count("*").alias("c"))
        )
        sb = (
            DD.shingle_hashes(docs.filter(F.col("doc_id") % 7 == 0), "text", 3)
            .groupBy("hx").agg(F.count("*").alias("b"))
        )
        matches = sc.join(sb, "hx").agg(
            F.sum(F.col("c") * F.col("b"))
        ).collect()[0][0]
        dup_grams = (
            DD._positional_grams(docs, 5, "text")
            .groupBy("h").agg(F.count("*").alias("c"))
            .filter(F.col("c") > 1)
            .agg(F.sum("c")).collect()[0][0]
        )
        out[key] = {
            "simhash_true_pairs": int(pairs),
            "decontaminate_match_volume": int(matches or 0),
            "repeated_5gram_occurrences": int(dup_grams or 0),
        }
    print(json.dumps({"volumes": out, "sf_dirs": sf_dirs}))


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "heavy"
    if arg == "volumes":
        volumes()
        return
    if arg == "heavy":
        names = HEAVY
    elif arg == "default":
        names = DEFAULT
    else:
        names = arg.split(",")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    sf_dirs = _resolve_dirs()

    from flink_project_spark import cache as CACHE
    from flink_project_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark(app_name="scaling-probe")
    q = E.queries()
    out: dict[str, dict[str, float]] = {}
    rowcounts: dict[str, int] = {}
    build_s: dict[str, float] = {}

    for sf_dir in sf_dirs:
        sf_key = os.path.basename(sf_dir.rstrip("/"))
        # pre-build the shared intermediates so per-query times measure
        # the query at each SF (mirrors bench.py's cache-build phase).
        # The build time is REPORTED per SF: several probed queries
        # (itemcf_cosine, doc_minhash_neardups) serve straight off a
        # persisted intermediate, so their chain's real scaling lives
        # here, not in the per-query number.
        t0 = time.perf_counter()
        for iname, df in E.shared_intermediates(spark, sf_dir).items():
            # the 60-bit/shingle signature table feeds exactly one
            # query; at sf10 its build is multi-second, so don't charge
            # every probe run for a table nothing probed will read
            if (
                iname == "simhash_scale"
                and "doc_simhash_neardups_scale" not in names
            ):
                continue
            df.write.format("noop").mode("overwrite").save()
        build_s[sf_key] = round(time.perf_counter() - t0, 2)
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

    keys = [os.path.basename(d.rstrip("/")) for d in sf_dirs]
    if len(keys) >= 2:
        lo_k, hi_k = keys[-2], keys[-1]
        ratio = rowcounts[hi_k] / rowcounts[lo_k]
        for name, d in out.items():
            lo, hi = d.get(lo_k), d.get(hi_k)
            if lo and hi and lo > 0:
                d["exp_last_step"] = round(
                    math.log(hi / lo) / math.log(ratio), 3
                )
    print(
        json.dumps(
            {
                "queries": out,
                "cache_build_seconds": build_s,
                "lineitem_rows": rowcounts,
                "sf_dirs": sf_dirs,
            }
        )
    )


if __name__ == "__main__":
    main()
