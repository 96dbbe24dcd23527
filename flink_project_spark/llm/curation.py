"""Corpus-curation operators — the selection/splitting stages of a
training-data pipeline (downstream of cleaning/dedup, upstream of
tokenization).

The operators a 100 TB corpus build needs beyond dedup/similarity:

- `train_split`: deterministic content-independent hash split into
  train/val/test. Pure per-row projection — no shuffle, no state, and
  REPRODUCIBLE across runs/engines because the bucket derives from
  md5 (`llm.hashing.v32`), not from a partitioner or RNG.
- `source_quota`: cap documents per source/domain (anti-domination —
  one crawl domain must not swamp the mixture). Per-group top-K by a
  deterministic preference order; the skew story is the same as
  neighbor-list truncation (operators/setops.py): plain window by
  default, `top_k_per_group_salted` as the hot-domain escape hatch.
- `decontaminate`: remove corpus documents whose fingerprints collide
  with a held-out benchmark set (train/test contamination). The join
  shape is the scale-critical part: OR-matching on two fingerprint
  columns is expressed as TWO equi-semi-joins + union — never an
  OR-condition join, which would plan as a nested loop.

All three are pure DataFrame transforms with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_project_spark.llm.hashing import v32
from flink_project_spark.llm import text as TX

#: default corpus split: 98/1/1 over 100 hash buckets
DEFAULT_RATIOS: tuple[tuple[str, int], ...] = (
    ("train", 98),
    ("val", 1),
    ("test", 1),
)


def train_split(
    docs: DataFrame,
    key_col: str = "doc_id",
    salt: str = "split",
    ratios: tuple[tuple[str, int], ...] = DEFAULT_RATIOS,
) -> DataFrame:
    """Assign each row a deterministic split label.

    bucket = v32(salt ':' key) % 100; labels take consecutive bucket
    ranges in `ratios` order (percents must sum to 100). Salting the
    hash means re-splitting with a new salt is a one-line change and
    two different splits are independent. Content-independent (keyed on
    the id) so near-duplicate leakage across splits is handled by the
    dedup stage, not hidden by the splitter.
    """
    total = sum(p for _, p in ratios)
    if total != 100:
        raise ValueError(f"split percents must sum to 100, got {total}")
    bucket = (
        v32(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
        % 100
    )
    expr = None
    lo = 0
    for name, pct in ratios:
        cond = bucket < F.lit(lo + pct)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo += pct
    return docs.withColumn("split", expr)


def source_quota(
    docs: DataFrame,
    quota: int,
    by: str = "source",
    salted: bool = False,
) -> DataFrame:
    """Keep at most `quota` documents per `by` group, preferring longer
    documents (n_chars DESC, doc_id ASC tie-break — a total order, so
    the kept set is deterministic).

    Plain per-group window by default; `salted=True` switches to the
    two-phase partial/final truncation for hot domains (same trade-off
    as neighbor-list top-K — see operators/setops.py).
    """
    from flink_project_spark.operators.setops import (
        top_k_per_group,
        top_k_per_group_salted,
    )

    slim = docs.select("doc_id", by, "n_chars")
    if salted:
        return top_k_per_group_salted(
            slim.withColumn("_neg", -F.col("n_chars")),
            [by],
            ["_neg", "doc_id"],
            quota,
            ascending=True,
        ).drop("_neg")
    return top_k_per_group(
        slim, [by], [F.col("n_chars").desc(), F.col("doc_id").asc()], quota
    )


def stratified_sample(
    docs: DataFrame,
    n_per_stratum: int,
    by: str = "lang",
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Exactly-N-per-stratum deterministic sample: within each `by`
    group keep the `n_per_stratum` rows with the smallest
    ``md5(salt ':' key)`` — uniform-at-random in expectation (md5 is an
    avalanche hash of the key) yet fully reproducible across runs and
    engines, with no RNG state. Changing `salt` draws an independent
    sample.

    Plan: one hash-partitioned window per stratum (the same top-K shape
    as `source_quota`; for a hot stratum use the salted two-phase
    variant in operators/setops.py). When an exact count isn't required,
    prefer `sample_by_hash` — a pure filter with NO shuffle at all.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    w = Window.partitionBy(by).orderBy(h.asc(), F.col(key_col).asc())
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def sample_by_hash(
    docs: DataFrame,
    rate_pct: int,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Bernoulli-style deterministic sample: keep rows whose
    ``v32(salt ':' key) % 100`` falls under `rate_pct`. A pure per-row
    projection + filter — zero shuffle, streams through the scan at any
    scale, and the same (salt, key) always lands in the same draw, so
    incremental corpus builds resample consistently. The percentage is
    exact only in expectation; use `stratified_sample` for exact-N.
    """
    if not 0 <= rate_pct <= 100:
        raise ValueError(f"rate_pct must be 0..100, got {rate_pct}")
    bucket = v32(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))) % 100
    return docs.filter(bucket < F.lit(rate_pct))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Corpus documents whose fingerprint collides with the benchmark
    set: (doc_id, match_type) with match_type 'exact' (normalized
    content md5) or 'ngram' (min-shingle-md5, a 1-permutation MinHash —
    winnowing-style coarse overlap). A doc matching both reports
    'exact' (min of the two tags).

    This is the flag list — callers drop it with an anti-join. The
    operator demonstrates the decontamination JOIN SHAPE at scale: the
    benchmark fingerprint sets are tiny (broadcast semi-joins), the
    corpus side streams, and the two match columns are separate
    equi-joins unioned — an `ON a.x = b.x OR a.y = b.y` join would be a
    nested loop. Production pipelines verify 'ngram' hits against the
    full near-dup pair table (llm.dedup) before dropping.
    """
    fp_c = TX.fingerprint(corpus, text_col)
    fp_b = TX.fingerprint(benchmark, text_col)
    b_exact = F.broadcast(
        fp_b.select("content_md5").distinct().withColumn("_e", F.lit(1))
    )
    b_ngram = F.broadcast(
        fp_b.select("min_shingle_md5").distinct().withColumn("_n", F.lit(1))
    )
    # ONE pass over the corpus fingerprints (the expensive shingle
    # explode + min aggregate) with both flag joins attached as
    # broadcast left joins — the union-of-semi-joins form evaluated the
    # fingerprint subtree once per match column. fingerprint() emits one
    # row per doc, so no regrouping is needed to dedup match types.
    return (
        fp_c.join(b_exact, "content_md5", "left")
        .join(b_ngram, "min_shingle_md5", "left")
        .filter(F.col("_e").isNotNull() | F.col("_n").isNotNull())
        .select(
            "doc_id",
            F.when(F.col("_e").isNotNull(), F.lit("exact"))
            .otherwise(F.lit("ngram"))
            .alias("match_type"),
        )
    )
