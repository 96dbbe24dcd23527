"""One-call batch corpus curation: the documented composition of the
engine's curation stages, in the order a production corpus build runs
them.

    exact dedup -> near-dup dedup (MinHash-LSH + CC) -> quality gate
    -> benchmark decontamination -> mixture resampling -> train split
    [-> chunking]

Every stage is one of the individually-oracled operators; this module
adds only the glue (semi/anti joins between stages and the broadcast
join that turns `mixture_plan`'s per-source `keep_rate_pct` into the
per-row hash draw). The return value keeps each stage's frame so a
caller can land any intermediate (the cluster workflow: write each
stage to parquet, point the next run at the furthest-landed stage).

Laziness: with dedup_mode="single_link" nothing here triggers a job —
stages are plans until the caller writes or counts them. The DEFAULT
dedup_mode="cc" is the exception: connected components is iterative,
so constructing the result runs the exact-dedup -> LSH candidate ->
CC jobs eagerly at call time (the price of a converged component
table; pick "single_link" to stay fully lazy at reduced chain
correctness). `CurationResult.audit()` re-executes each stage's plan
for its count — on a large corpus persist (or land and re-read) the
stages you intend to audit first; only the near-dup band table and
the CC checkpoint are shared across counts automatically.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_project_spark.cache import persist_tracked
from flink_project_spark.llm import curation as CUR
from flink_project_spark.llm import dedup as DD
from flink_project_spark.llm import text as TX


@dataclass
class CurationResult:
    """Per-stage frames, insertion-ordered from raw input to output.

    `final` is the last non-chunk stage (the split-labeled corpus);
    `chunks` is present only when chunking was requested.
    `lsh_audits` holds the near-dup stage's deferred bucket-cap audit
    frames (`llm.dedup.near_dup_pairs(audit_sink=...)`) — materialized
    by `audit()` so the LSH `max_bucket` cap is never silent in the
    pipeline (the module's no-silent-caps rule).
    """

    stages: dict[str, DataFrame] = field(default_factory=dict)
    lsh_audits: list = field(default_factory=list)

    @property
    def final(self) -> DataFrame:
        names = [n for n in self.stages if n != "chunks"]
        return self.stages[names[-1]]

    @property
    def chunks(self) -> DataFrame | None:
        return self.stages.get("chunks")

    def audit(self) -> dict[str, int]:
        """Row count per stage — the yield funnel a corpus build
        reports — plus `lsh_dropped_buckets`/`lsh_dropped_members`
        from the near-dup stage's bucket-cap audit (0 when the cap
        never bound). Each count RE-EXECUTES that stage's plan (Spark
        caches nothing across separate actions) — at scale, persist or
        land the stages first and audit the landed frames."""
        out = {name: df.count() for name, df in self.stages.items()}
        dropped_buckets = dropped_members = 0
        for adf in self.lsh_audits:
            for row in adf.collect():
                dropped_buckets += row["buckets"] or 0
                dropped_members += row["dropped"] or 0
        out["lsh_dropped_buckets"] = dropped_buckets
        out["lsh_dropped_members"] = dropped_members
        return out


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    quality_threshold: float = 0.5,
    dedup_mode: str = "cc",
    mixture_weights: dict[str, float] | None = None,
    apply_mixture: bool = True,
    mixture_mode: str = "plan",
    split_ratios: tuple[tuple[str, int], ...] = CUR.DEFAULT_RATIOS,
    chunk_tokens: int | None = None,
    chunk_stride: int | None = None,
    strip_spans_n: int | None = None,
) -> CurationResult:
    """Run the full curation funnel over `docs` (doc_id, source, text,
    ...). Stages and their scale shapes:

    1. ``exact_dedup``: md5-canonical semi-join (one 32-byte-key
       shuffle; the winner is the min doc_id — deterministic).
    2. ``near_dedup``: MinHash-LSH pair graph -> `dedup_mode`
       ("cc" = one survivor per connected component, "single_link" =
       the cheap greedy rule) — the same audited, capped, never-
       all-pairs machinery as the `doc_minhash_neardups` /
       `doc_dedup_cc` contract queries.
    2b. ``span_stripped`` (if `strip_spans_n`): after whole-doc
       near-dedup, remove the remaining PARTIAL overlaps — duplicated
       >= strip_spans_n-token substrings (ExactSubstr, `llm.dedup.
       strip_dup_spans`) — rewriting each survivor's text; docs left
       with zero tokens are dropped. Runs over the deduped corpus so
       the gram table never pays for docs already removed.
    3. ``quality_gate``: composite `quality_score` >= threshold,
       attached by a doc_id join (score is a pure projection).
    4. ``decontaminated`` (if `benchmark` given): drop docs whose
       fingerprints collide with the benchmark set — broadcast
       semi-join flags, anti-joined away.
    5. ``mixture_sampled`` (if `apply_mixture`): keep-rates
       broadcast-joined on source, realized by the deterministic
       per-row hash draw (`sample_by_rate_column`). `mixture_mode`:
       "plan" (uniform target, or `mixture_weights` when given) or
       "temperature" (alpha=0.5 sqrt-smoothed targets via
       `mixture_temperature`; `mixture_weights` must be None).
    6. ``split``: deterministic hash split labels (pure projection).
    7. ``chunks`` (if `chunk_tokens`): zero-shuffle sliding-window
       chunking with source/split labels carried through.
    """
    # config validation up front (NOT inside `if apply_mixture:` — a
    # typo'd mode in a no-mixture run must still be reported, before
    # any job runs)
    if mixture_mode not in ("plan", "temperature"):
        raise ValueError(
            f"unknown mixture_mode {mixture_mode!r} "
            "(expected 'plan' or 'temperature')"
        )
    if mixture_mode == "temperature" and mixture_weights is not None:
        raise ValueError(
            "mixture_weights is only valid with mixture_mode='plan' — "
            "temperature mode derives its own targets"
        )

    r = CurationResult()
    r.stages["input"] = docs

    exact = DD.exact_dedup_groups(docs, text_col).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    deduped = docs.join(exact, "doc_id", "left_semi")
    r.stages["exact_dedup"] = deduped

    pairs = DD.near_dup_pairs(
        deduped, text_col=text_col, audit_sink=r.lsh_audits
    )
    near = DD.dedup_keep_canonical(deduped, pairs, mode=dedup_mode)
    r.stages["near_dedup"] = near

    if strip_spans_n is not None:
        # `is not None`, not truthiness: an explicit 0 must reach
        # strip_dup_spans' validator and raise, exactly like
        # chunk_tokens=0 below — not silently skip the stage.
        # near feeds BOTH legs of the rebuild join (the gram scans
        # inside strip_dup_spans and the text re-attach), so persist it
        # or the whole exact+near dedup lineage executes twice.
        near = persist_tracked(near, label="curate_near_dedup")
        stripped = DD.strip_dup_spans(near, n=strip_spans_n, text_col=text_col)
        near = near.drop(text_col).join(
            stripped.filter(F.col("kept_tokens") > 0).select(
                "doc_id", F.col("clean_text").alias(text_col)
            ),
            "doc_id",
        )
        r.stages["span_stripped"] = near

    # quality is a PURE projection — attach it as a column; the old
    # doc_id join-back re-executed near's whole dedup lineage on both
    # join legs and shuffled the corpus just to append one double
    gated = near.withColumn(
        "quality", TX.quality_column(text_col)
    ).filter(F.col("quality") >= F.lit(float(quality_threshold)))
    r.stages["quality_gate"] = gated

    current = gated
    if benchmark is not None:
        flags = CUR.decontaminate(current, benchmark, text_col).select(
            "doc_id"
        )
        current = current.join(flags, "doc_id", "left_anti")
        r.stages["decontaminated"] = current

    if apply_mixture:
        if mixture_mode == "temperature":
            plan = CUR.mixture_temperature(current, text_col=text_col)
        else:
            plan = CUR.mixture_plan(
                current, weights=mixture_weights, text_col=text_col
            )
        plan = plan.select(
            F.col("source").alias("_mix_src"), "keep_rate_pct"
        )
        # null-safe: mixture_plan's groupBy put NULL-source docs in
        # their own group with a keep rate — an equi-join here would
        # silently drop them despite the plan claiming they were kept
        current = CUR.sample_by_rate_column(
            current.join(
                F.broadcast(plan),
                current["source"].eqNullSafe(F.col("_mix_src")),
            ).drop("_mix_src"),
            "keep_rate_pct",
        ).drop("keep_rate_pct")
        r.stages["mixture_sampled"] = current

    labeled = CUR.train_split(current, ratios=split_ratios)
    r.stages["split"] = labeled

    if chunk_tokens is not None:  # explicit 0 must reach the validator
        r.stages["chunks"] = CUR.chunk_spans(
            labeled,
            chunk_tokens=chunk_tokens,
            # None means full stride; an explicit 0 must reach
            # chunk_spans' validator, not silently become full stride
            stride=chunk_tokens if chunk_stride is None else chunk_stride,
            text_col=text_col,
            carry_cols=("source", "split"),
        )
    return r
