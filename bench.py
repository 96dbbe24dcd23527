"""Benchmark harness — times the engine's headline queries.

Runs every entry in ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
(the compact line carries the top-20 heaviest queries inline so a
byte-bounded tail capture retains per-query data; the full per-query
map follows on a detail line plus self-describing <=1.5 KB chunk
lines, and the compact line repeats last)

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

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    import __spark_entry__ as entrymod
    from flink_project_spark.session import get_spark

    spark = get_spark(app_name="fps-bench")

    # JVM warmup covering the machinery every query touches (codegen,
    # shuffle, broadcast) so q1 isn't charged for first-use initialization
    def _probe() -> float:
        n = spark.read.parquet(f"{sf_dir}/nation.parquet")
        r = spark.read.parquet(f"{sf_dir}/region.parquet")
        t0 = time.perf_counter()
        (
            n.join(r, n.n_regionkey == r.r_regionkey)
            .groupBy("r_name")
            .count()
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return round(time.perf_counter() - t0, 4)

    _probe()  # first call pays codegen; discard
    # Calibration probes: the identical tiny fixed job timed at run
    # start, before every timing pass, and at run end. On a quiet host
    # it reads ~0.10-0.15 s at local[32] (QUIET_PROBE_S is the dirty
    # THRESHOLD above that band); a contended host inflates it
    # proportionally.
    # Round 5's official artifact landed in a sustained contention
    # window (probes 0.63-0.66 s, total 87.2 s vs 61.7-70.9 s on quiet
    # re-runs of identical code), so this harness now ACTS on its own
    # probes instead of leaving them as side-channel evidence: a pass
    # whose leading probe median exceeds QUIET_PROBE_S x DIRTY_FACTOR
    # is marked dirty, and if no clean pass happened after the standard
    # runs, up to SPARK_GRAFT_BENCH_MAX_EXTRA (default 2) bounded extra
    # passes run until one lands in a quiet window. min-per-query
    # aggregation then draws from at least one quiet pass, making the
    # headline number trustworthy without side files. The compact line
    # carries the verdict ("window") plus a probe-normalized total as a
    # secondary, coarser cross-check.
    QUIET_PROBE_S = float(os.environ.get("SPARK_GRAFT_QUIET_PROBE", "0.40"))
    DIRTY_FACTOR = 1.5
    # Quiet reference for the SHUFFLE probe (round 7: the probe now
    # feeds the verdict, not just the record — see _probe_shuffle).
    # The probe's fixed 2M-row exchange costs more on fewer cores, so
    # the default scales with the session's parallelism: ~0.25-0.45 s
    # quiet at local[32] (0.53-0.74 measured during the slow windows),
    # ~0.55-0.70 s quiet at the 3-core verify shape.
    SHUFFLE_QUIET_S = float(
        os.environ.get(
            "SPARK_GRAFT_QUIET_SHUFFLE",
            "0.40"
            if spark.sparkContext.defaultParallelism >= 16
            else "0.80",
        )
    )
    SHUFFLE_DIRTY_FACTOR = 1.25

    def _probe_median(n: int = 3) -> float:
        vals = sorted(_probe() for _ in range(n))
        return vals[n // 2]

    # Shuffle-shaped probe: the round-6 refresh runs hit a contention
    # mode the tiny broadcast-join probe is blind to — sustained
    # shuffle/IO-side host steal (build passes 58-76 s vs the 11-15 s
    # norm while every CPU probe read a quiet 0.11-0.15 s). This probe
    # moves ~2M rows through one real exchange (~0.25-0.45 s quiet at
    # local[32]; 0.74-0.87 s measured during the dirty windows),
    # sampled at run start/end AND once before every timing pass — the
    # mid-run steal windows are exactly the ones the endpoint samples
    # straddle. Round 7 promoted it from record-only to a VERDICT
    # component: a same-code run measured a uniform ~1.17x per-query
    # inflation (45.7 -> 53.7 s over the unchanged-query set) with
    # every CPU probe clean and low pass dispersion — the only signal
    # was shuffle probes at 0.53-0.74 vs the 0.24-0.40 quiet band, so
    # a verdict that ignores them certifies a contended run as clean.
    # Shuffle-dirty windows now trigger the same bounded extra passes,
    # and the compact line carries `shuffle_clean` AND-ed into
    # `clean`.
    def _probe_shuffle() -> float:
        t0 = time.perf_counter()
        (
            spark.range(2_000_000)
            .withColumn("k", F.col("id") % 1024)
            .repartition(32, "k")
            .groupBy("k")
            .count()
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return round(time.perf_counter() - t0, 4)

    _probe_shuffle()  # codegen warm-up; discard
    probe_start = [_probe() for _ in range(3)]
    shuffle_probe_start = [_probe_shuffle() for _ in range(2)]

    # Cache-build phase: materialize the shared persisted intermediates
    # once, timed separately, so per-query numbers measure the query
    # rather than whichever chain build it happens to trigger first.
    # The build time is INCLUDED in the reported total (value) — the
    # split only makes attribution honest, it doesn't hide the cost.
    # Codegen warm-up: run the build chains once at the smallest scale
    # factor (sub-second data). Generated-code compilation is keyed by
    # the generated source, which is identical across scale factors, so
    # the timed build below measures the engine on data rather than the
    # one-time Janino compile of each plan shape. The warm-up's persists
    # are released before timing.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(
        sf_dir
    ):
        from flink_project_spark import cache as _cache

        for df in entrymod.shared_intermediates(spark, warm_dir).values():
            df.write.format("noop").mode("overwrite").save()
        _cache.clear(spark)

    # Independent chains are materialized concurrently — Spark's
    # scheduler interleaves the jobs, and small-data stages leave most
    # cores idle otherwise. Two phases: the BASE tables everything else
    # derives from (parsed logs, spread corpora) build first in
    # parallel, then every derived chain fans out at once — round 4's
    # three-chain split serialized ~12 doc-derived tables behind one
    # thread and the build was 2-3x the longest single chain. The dict
    # is ordered dependency-first WITHIN a chain, so each thread walks
    # one chain sequentially; the cluster analog is a pipeline DAG
    # materializing independent stages in parallel.
    _BASES = ("valid_actions", "recall_log", "docs", "emb")

    def _chain(name: str) -> str:
        if name.startswith("itemcf"):
            return "itemcf"
        if name.startswith("auc"):
            return "auc"
        if name.startswith("neardups"):
            return "neardup"
        if name == "dupspans":
            return "spans"
        if name in ("simhash", "quality"):
            return "text"
        if name == "simhash_scale":
            # own chain: independent of the 32-bit table, so it
            # overlaps the text chain instead of queuing behind it
            return "text_scale"
        if name in ("doc_word_tf", "rarity_vocab", "fingerprints"):
            return "tf"
        if name.startswith("payload"):
            return "media"
        return "rest"

    def _run_chain(dfs: list) -> None:
        for df in dfs:
            df.write.format("noop").mode("overwrite").save()

    from concurrent.futures import ThreadPoolExecutor

    from flink_project_spark import cache as _cache

    def _build_once() -> float:
        t0 = time.perf_counter()
        inter = entrymod.shared_intermediates(spark, sf_dir)
        bases = [[df] for name, df in inter.items() if name in _BASES]
        chains: dict[str, list] = {}
        for name, df in inter.items():
            if name not in _BASES:
                chains.setdefault(_chain(name), []).append(df)
        with ThreadPoolExecutor(max_workers=max(len(bases), 1)) as pool:
            list(pool.map(_run_chain, bases))
        with ThreadPoolExecutor(max_workers=max(len(chains), 1)) as pool:
            list(pool.map(_run_chain, chains.values()))
        return round(time.perf_counter() - t0, 4)

    # The build is measured min-of-N under the SAME aggregation policy
    # as the per-query times (this VM shows ±2x host-contention spikes;
    # min-of-N measures the engine, not the neighbor). Each extra pass
    # releases the persisted tables and rebuilds them from parquet —
    # full real work, both raw pass times reported.
    build_probes = [_probe_median()]
    build_shuffle_probes = [_probe_shuffle()]
    build_passes = [_build_once()]
    for _ in range(max(1, int(os.environ.get("SPARK_GRAFT_BUILD_RUNS", "2"))) - 1):
        _cache.clear(spark)
        build_probes.append(_probe_median())
        build_shuffle_probes.append(_probe_shuffle())
        build_passes.append(_build_once())
    # same contention rule as the per-query passes: if every build pass
    # ran in a dirty window — CPU-dirty or shuffle-dirty (the builds
    # are the most shuffle-heavy phase, and the r6 incident hit
    # exactly them) — one bounded rebuild in the hope of a quiet one
    # (min aggregation picks it up if so)
    if all(p > QUIET_PROBE_S * DIRTY_FACTOR for p in build_probes) or all(
        p > SHUFFLE_QUIET_S * SHUFFLE_DIRTY_FACTOR
        for p in build_shuffle_probes
    ):
        _cache.clear(spark)
        build_probes.append(_probe_median())
        build_shuffle_probes.append(_probe_shuffle())
        build_passes.append(_build_once())
    cache_build = min(build_passes)

    # Per-query wall times are min-of-N (default 3 passes): this VM
    # shows multi-second single-query spikes under host contention
    # (±2x run-to-run on identical plans), and min-of-N is the standard
    # way to measure the engine rather than the noisy neighbor. Both
    # pass totals are reported so the aggregation is transparent; the
    # cache build runs ONCE and is included in the total as real work.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    max_extra = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_MAX_EXTRA", "2")))
    passes: list[dict[str, float]] = []
    pass_probes: list[float] = []

    pass_shuffle_probes: list[float] = []
    # Per-query Spark JOB counts, captured once on the first timed pass
    # (job DAGs are deterministic per plan; AQE re-optimization jobs are
    # included, which is the point). This makes the "local stage floor"
    # argument mechanically checkable in the artifact itself: a query
    # whose wall time sits within a small multiple (~2x) of
    # jobs x the artifact's own best_pass_probe_s is paying
    # scheduling overhead, not plan inefficiency — PLANS.md floor rows
    # reference this column instead of hand-counted exchanges.
    # (QUIET_PROBE_S=0.40 is the DIRTY threshold, not typical quiet:
    # a quiet local[32] probe reads ~0.10-0.15 s.)
    job_counts: dict[str, int] = {}

    def _timed_pass(count_jobs: bool = False) -> None:
        pass_probes.append(_probe_median())
        pass_shuffle_probes.append(_probe_shuffle())
        timings: dict[str, float] = {}
        sc = spark.sparkContext
        for name, fn in entrymod.queries().items():
            if count_jobs:
                sc.setJobGroup(f"bench:{name}", name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
            if count_jobs:
                job_counts[name] = len(
                    sc.statusTracker().getJobIdsForGroup(f"bench:{name}")
                )
        if count_jobs:
            # leave a sentinel group so later passes' jobs never land in
            # the last query's group (counts above are already taken)
            sc.setJobGroup("bench:untracked", "post-count passes")
        passes.append(timings)

    _timed_pass(count_jobs=True)
    for _ in range(runs - 1):
        _timed_pass()
    dirty_bar = QUIET_PROBE_S * DIRTY_FACTOR
    shuffle_bar = SHUFFLE_QUIET_S * SHUFFLE_DIRTY_FACTOR
    extra_passes = 0
    while (
        all(p > dirty_bar for p in pass_probes)
        or all(p > shuffle_bar for p in pass_shuffle_probes)
    ) and extra_passes < max_extra:
        extra_passes += 1
        _timed_pass()
    # Second contention signal (round-6 incident): spikes can hit
    # MID-pass while every surrounding probe reads quiet — observed
    # pass totals of 182/65/68 s on identical code minutes apart. High
    # dispersion across pass totals means some pass absorbed a spike;
    # min-per-query usually rescues single-query hits, but one bounded
    # extra pass materially improves the odds that every query saw at
    # least one quiet window.
    # (an if, not a loop: the spiked pass never leaves `passes`, so
    # dispersion stays high forever — one extra quiet-probed pass is
    # the useful remedy and the budget stays bounded)
    totals = [sum(p.values()) for p in passes]
    if max(totals) > 1.5 * min(totals) and extra_passes < max_extra:
        extra_passes += 1
        _timed_pass()
    best = {k: min(p[k] for p in passes) for k in passes[0]}

    probe_end = [_probe() for _ in range(3)]
    shuffle_probe_end = [_probe_shuffle() for _ in range(2)]
    total = round(sum(best.values()) + cache_build, 2)
    # Window verdict: the best (cleanest) probe that preceded any
    # counted pass. If even the cleanest window was dirty after the
    # bounded retries, the compact line says so AND carries a coarse
    # probe-normalized total (linear deflation by observed/quiet probe
    # ratio — a cross-check, not a replacement for a quiet re-run).
    best_pass_probe = min(pass_probes)
    # the build contributes to `total`, so its window counts too: clean
    # means BOTH the cleanest build window and the cleanest pass window
    # ran quiet. The normalization deflates by the LIMITING component —
    # whichever of the two cleanest windows was dirtier — so a
    # build-dirty/pass-quiet run still gets a real deflation instead of
    # a no-op "normalized" copy of the raw total.
    effective_probe = max(best_pass_probe, min(build_probes))
    cpu_clean = effective_probe <= dirty_bar
    # the shuffle leg of the verdict: at least one timing pass AND at
    # least one cache build must have started in a shuffle-quiet
    # window (min aggregation then draws from those; the build
    # contributes to `total`, so its window counts too — same max-of-
    # cleanest-components rule as the CPU leg above). The CPU
    # normalization below stays CPU-only — shuffle steal doesn't
    # inflate linearly in the probe ratio, so a shuffle-dirty run gets
    # the honest flag rather than a pretend correction.
    best_pass_shuffle = min(pass_shuffle_probes)
    effective_shuffle = max(best_pass_shuffle, min(build_shuffle_probes))
    shuffle_clean = effective_shuffle <= shuffle_bar
    window_clean = cpu_clean and shuffle_clean
    norm = (
        min(1.0, QUIET_PROBE_S / effective_probe)
        if effective_probe > 0
        else 1.0
    )
    probe_normalized = round(total * (1.0 if cpu_clean else norm), 2)
    # The COMPACT total line prints FIRST on its own line so a bounded
    # capture always gets a parseable primary artifact (round 3's single
    # giant line outgrew the driver's tail buffer and parsed as null).
    # Per-query detail follows on a second line; the compact line repeats
    # LAST so a byte-based *tail* capture also lands on an intact copy.
    # Round 8: the driver keeps only a ~2,000-byte stdout TAIL, which
    # truncated the full 111-query detail line and left the round-7
    # per-query comparison empty (PERF_r07.per_query == {}). Two
    # additions, both additive (no existing key removed or renamed):
    # the compact line now carries the TOP-20 heaviest queries inline
    # (~600 bytes — the whole line stays ~1.1 KB, inside any tail
    # capture), and the full per-query detail re-prints as a series of
    # self-describing <=1.5 KB chunk lines so a bounded capture retains
    # at least the trailing chunks intact. The timed region and the
    # aggregation are unchanged; the full single detail line still
    # prints for local artifact tooling.
    heavy = dict(
        sorted(
            ((k, round(v, 2)) for k, v in best.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )[:20]
    )
    compact = json.dumps(
        {
            "metric": "total_query_seconds",
            "value": total,
            "unit": "sec",
            "cache_build_seconds": round(cache_build, 2),
            "sf": sf,
            "n_queries": len(best),
            "queries": heavy,
            "queries_included": "top20_by_seconds",
            "window": {
                "clean": window_clean,
                "cpu_clean": cpu_clean,
                "shuffle_clean": shuffle_clean,
                "best_pass_probe_s": round(best_pass_probe, 2),
                "effective_probe_s": round(effective_probe, 2),
                "best_pass_shuffle_probe_s": round(best_pass_shuffle, 2),
                "effective_shuffle_probe_s": round(effective_shuffle, 2),
                "quiet_ref_s": QUIET_PROBE_S,
                "quiet_shuffle_ref_s": SHUFFLE_QUIET_S,
                "extra_passes": extra_passes,
                "probe_normalized_value": probe_normalized,
            },
        }
    )
    print(compact, flush=True)
    print(
        json.dumps(
            {
                "detail": "bench_per_query",
                "queries": {k: round(v, 2) for k, v in best.items()},
                "jobs": job_counts,
                "cache_build_passes": [round(b, 2) for b in build_passes],
                "bench_runs": runs,
                "aggregation": "min_per_query",
                "pass_totals": [round(sum(p.values()), 2) for p in passes],
                "calibration_probe_seconds": {
                    "start": [round(p, 2) for p in probe_start],
                    "per_build": [round(p, 2) for p in build_probes],
                    "shuffle_per_build": [
                        round(p, 2) for p in build_shuffle_probes
                    ],
                    "per_pass": [round(p, 2) for p in pass_probes],
                    "end": [round(p, 2) for p in probe_end],
                    "shuffle_start": [round(p, 2) for p in shuffle_probe_start],
                    "shuffle_per_pass": [
                        round(p, 2) for p in pass_shuffle_probes
                    ],
                    "shuffle_end": [round(p, 2) for p in shuffle_probe_end],
                },
            }
        ),
        flush=True,
    )
    # chunked per-query detail (round 8): each line is independently
    # parseable JSON under ~1.5 KB, so a byte-bounded tail capture that
    # cannot hold the full detail line still lands on whole chunks.
    names = list(best)
    chunk_size = 24
    n_chunks = (len(names) + chunk_size - 1) // chunk_size
    for ci in range(n_chunks):
        part = names[ci * chunk_size : (ci + 1) * chunk_size]
        print(
            json.dumps(
                {
                    "detail": "bench_per_query_chunk",
                    "chunk": ci + 1,
                    "chunks": n_chunks,
                    "queries": {k: round(best[k], 2) for k in part},
                    "jobs": {
                        k: job_counts[k] for k in part if k in job_counts
                    },
                }
            ),
            flush=True,
        )
    print(compact, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
