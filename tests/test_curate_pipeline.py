"""curate_corpus: the one-call composition of the curation stages.

The component operators each have their own oracle/tests; these tests
pin the GLUE — stage ordering, survivor-set joins, the mixture
broadcast composition, and metadata carried into chunking.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from flink_project_spark.llm.pipeline import curate_corpus


def _corpus(spark):
    rnd = random.Random(3)
    vocab = [f"tok{i}" for i in range(200)]
    mk = lambda n, r: " ".join(r.choice(vocab) for _ in range(n))  # noqa: E731

    rows = []
    # s_big: 40 long distinct docs (the dominating source)
    for i in range(40):
        rows.append((i, "s_big", mk(40, random.Random(50 + i))))
    # s_small: 6 docs
    for i in range(40, 46):
        rows.append((i, "s_small", mk(40, random.Random(500 + i))))
    # exact duplicate of doc 0 (later id loses)
    rows.append((100, "s_big", rows[0][2]))
    # near-dup chain of doc 1: one-word edits
    base = rows[1][2].split()
    e1 = list(base)
    e1[3] = "zzz"
    e2 = list(e1)
    e2[7] = "yyy"
    rows.append((101, "s_big", " ".join(e1)))
    rows.append((102, "s_big", " ".join(e2)))
    # junk doc (fails the length gate: < 10 words)
    rows.append((103, "s_small", "short junk"))
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_curate_corpus_funnel(spark):
    docs = _corpus(spark)
    bench = docs.filter(F.col("doc_id") == 5).select("doc_id", "text")
    r = curate_corpus(
        docs,
        benchmark=bench,
        quality_threshold=0.5,
        chunk_tokens=16,
        chunk_stride=16,
    )
    assert list(r.stages) == [
        "input",
        "exact_dedup",
        "near_dedup",
        "quality_gate",
        "decontaminated",
        "mixture_sampled",
        "split",
        "chunks",
    ]
    audit = r.audit()
    # the funnel shrinks monotonically up to the split stage
    names = [n for n in r.stages if n != "chunks"]
    for a, b in zip(names, names[1:]):
        assert audit[b] <= audit[a], (a, b, audit)
    # the LSH bucket cap is surfaced, and never binds on this corpus
    assert audit["lsh_dropped_buckets"] == 0
    assert audit["lsh_dropped_members"] == 0

    exact_ids = {x["doc_id"] for x in r.stages["exact_dedup"].collect()}
    assert 100 not in exact_ids and 0 in exact_ids  # md5 dup loses to min id
    near_ids = {x["doc_id"] for x in r.stages["near_dedup"].collect()}
    # CC mode: the whole chain {1, 101, 102} keeps exactly its minimum
    assert 1 in near_ids and not {101, 102} & near_ids
    gated_ids = {x["doc_id"] for x in r.stages["quality_gate"].collect()}
    assert 103 not in gated_ids  # junk fails the word-count gate
    dec_ids = {x["doc_id"] for x in r.stages["decontaminated"].collect()}
    assert 5 not in dec_ids  # benchmark doc removed
    # split labels present and only from the default ratio set
    splits = {x["split"] for x in r.stages["split"].collect()}
    assert splits <= {"train", "val", "test"}
    # chunks carry source + split, and every chunk's doc survived
    ch = r.chunks.select("doc_id", "source", "split").collect()
    final_ids = {x["doc_id"] for x in r.stages["split"].collect()}
    assert {c["doc_id"] for c in ch} <= final_ids
    assert all(c["split"] in ("train", "val", "test") for c in ch)


def test_curate_corpus_stage_toggles(spark):
    """No benchmark -> no decontaminated stage; apply_mixture=False ->
    no sampling stage; no chunk_tokens -> no chunks; final == split."""
    docs = _corpus(spark)
    r = curate_corpus(docs, apply_mixture=False)
    assert "decontaminated" not in r.stages
    assert "mixture_sampled" not in r.stages
    assert r.chunks is None
    assert r.final is r.stages["split"]
    # without sampling, the split stage equals the quality gate rows
    assert r.audit()["split"] == r.audit()["quality_gate"]


def test_sample_by_rate_column_equals_scalar_rate(spark):
    """The pipeline's per-row draw must reproduce sample_by_hash for a
    constant rate — same hash rule, same kept set."""
    from flink_project_spark.llm.curation import (
        sample_by_hash,
        sample_by_rate_column,
    )

    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"] for r in sample_by_hash(docs, 37).collect()}
    b = {
        r["doc_id"]
        for r in sample_by_rate_column(
            docs.withColumn("rp", F.lit(37)), "rp"
        ).collect()
    }
    assert a == b and 0 < len(a) < 500


def test_curate_corpus_temperature_mixture(spark):
    """mixture_mode='temperature' runs the funnel with sqrt-smoothed
    targets (small sources keep MORE than under the uniform plan's
    min-source rule would force on the big one); invalid combinations
    are rejected before any job runs."""
    import pytest as _pytest

    docs = _corpus(spark)
    r = curate_corpus(docs, mixture_mode="temperature")
    assert "mixture_sampled" in r.stages
    assert r.final.count() > 0
    # the dominating source is downsampled, the small one survives
    kept = {
        row["source"]: row["n"]
        for row in r.stages["mixture_sampled"]
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert kept.get("s_small", 0) >= 1
    with _pytest.raises(ValueError, match="temperature"):
        curate_corpus(
            docs, mixture_mode="temperature", mixture_weights={"a": 1.0}
        )
    with _pytest.raises(ValueError, match="mixture_mode"):
        curate_corpus(docs, mixture_mode="bogus")


def test_curate_corpus_span_strip_stage(spark):
    """strip_spans_n: partial overlaps that SURVIVE whole-doc near-dedup
    (low jaccard, long shared run) are rewritten out of the text; docs
    stripped to zero tokens are dropped; the stage is absent by
    default."""
    docs = _corpus(spark)
    # doc 200 shares a 12-word run with doc 0 but is otherwise distinct:
    # jaccard << 0.8 so near-dedup keeps both; ExactSubstr strips the run
    run = " ".join(docs.filter(F.col("doc_id") == 0).head()["text"].split()[:12])
    opening = " ".join(f"fresh{i}" for i in range(18)) + " "
    extra = spark.createDataFrame(
        [(200, "s_big", opening + run)],
        ["doc_id", "source", "text"],
    )
    both = docs.union(extra)
    r = curate_corpus(
        both, apply_mixture=False, chunk_tokens=None, strip_spans_n=6
    )
    assert "span_stripped" in r.stages
    kept = {
        row["doc_id"]: row["text"]
        for row in r.stages["span_stripped"].collect()
    }
    assert 200 in kept and 0 in kept
    assert run not in kept[200] and run not in kept[0]
    assert kept[200].startswith("fresh0 fresh1")
    # default run has no such stage
    r2 = curate_corpus(docs, apply_mixture=False)
    assert "span_stripped" not in r2.stages


def test_mixture_stage_keeps_null_source_docs(spark):
    """mixture_plan groups NULL-source docs as their own source with a
    keep rate; the pipeline's plan join must be null-safe — an
    equi-join would silently drop every NULL-source doc while the plan
    claims they were kept."""
    from flink_project_spark.llm.pipeline import curate_corpus

    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(30)), "en", "s0", 0)
        for i in range(10)
    ] + [
        (100 + i, " ".join(f"n{i}_{j}" for j in range(30)), "en", None, 0)
        for i in range(10)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    r = curate_corpus(
        docs,
        quality_threshold=0.0,
        apply_mixture=True,
        chunk_tokens=None,
    )
    out = r.stages["mixture_sampled"]
    # uniform weights + equal source sizes -> keep_rate 100 for both
    # groups; every doc (incl. all NULL-source) must survive
    srcs = {r2.source for r2 in out.select("source").distinct().collect()}
    assert None in srcs, "NULL-source docs were dropped by the plan join"
    assert out.count() == 20


def test_sample_by_hash_rejects_float_rates(spark):
    """1.0 (a keep-everything FRACTION) must raise, not silently keep
    ~1%; same for 0.0 and 0.5."""
    import pytest as _pytest

    from flink_project_spark.llm import curation as CUR

    docs = spark.createDataFrame([(1,)], "doc_id long")
    for bad in (1.0, 0.0, 0.5):
        with _pytest.raises(ValueError):
            CUR.sample_by_hash(docs, bad)
    assert CUR.sample_by_hash(docs, 100).count() == 1


def test_quality_gate_is_projection_not_joinback(spark):
    """The quality gate must not re-execute the dedup lineage via a
    doc_id self-join: the quality_gate stage's plan contains NO join
    beyond those of its input stage."""
    from flink_project_spark.llm.pipeline import curate_corpus

    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(30)), "en", "s0", 0)
        for i in range(8)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    r = curate_corpus(docs, apply_mixture=False, chunk_tokens=None)
    def njoins(df):
        p = df._jdf.queryExecution().executedPlan().toString()
        return sum(p.count(j) for j in ("SortMergeJoin", "BroadcastHashJoin",
                                        "ShuffledHashJoin"))
    assert njoins(r.stages["quality_gate"]) == njoins(r.stages["near_dedup"])


def test_chunk_tokens_zero_reaches_validator(spark):
    import pytest as _pytest

    from flink_project_spark.llm.pipeline import curate_corpus

    docs = spark.createDataFrame(
        [(1, "a b c", "en", "s0", 0)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    with _pytest.raises(ValueError):
        curate_corpus(docs, apply_mixture=False, chunk_tokens=0)
