"""Tokenization-prep operators: chunking, sequence packing, rarity.

Each operator is checked against an independent pure-Python twin on
edge-heavy corpora (empty docs, exact-multiple lengths, stride !=
chunk), plus the physical-plan contracts that make the shapes scale
(chunking is a zero-shuffle generate; packing is one exchange per
bucket-partitioned window).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from flink_project_spark.llm import curation as CUR
from flink_project_spark.llm import text as TX
from flink_project_spark.llm.hashing import v32_py

DOCS = [
    (0, ""),
    (1, "   "),  # whitespace-only -> zero tokens
    (2, "a"),
    (3, " ".join(f"w{i}" for i in range(48))),  # exactly one stride
    (4, " ".join(f"w{i}" for i in range(64))),  # exactly one chunk
    (5, " ".join(f"w{i}" for i in range(65))),  # chunk + 1
    (6, " ".join(f"w{i % 7}" for i in range(96))),  # 2 starts, repeats
    (7, " ".join(f"w{i}" for i in range(200))),
    (8, "x y z x y z"),
]


def _mk_docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _py_chunks(docs, chunk: int, stride: int):
    out = []
    for doc_id, text in docs:
        ws = [w for w in text.split() if w]
        start = 0
        while start < len(ws):
            piece = " ".join(ws[start : start + chunk])
            out.append(
                (
                    doc_id,
                    start // stride,
                    start,
                    min(chunk, len(ws) - start),
                    hashlib.md5(piece.encode()).hexdigest(),
                )
            )
            start += stride
    return sorted(out)


def test_chunk_spans_matches_python_twin(spark):
    for chunk, stride in [(64, 48), (64, 64), (16, 32), (10, 3)]:
        got = sorted(
            tuple(r)
            for r in CUR.chunk_spans(
                _mk_docs(spark), chunk_tokens=chunk, stride=stride
            ).collect()
        )
        assert got == _py_chunks(DOCS, chunk, stride), (chunk, stride)


def test_chunk_spans_zero_token_docs_emit_no_chunks(spark):
    ids = {
        r.doc_id
        for r in CUR.chunk_spans(_mk_docs(spark)).select("doc_id").collect()
    }
    assert 0 not in ids and 1 not in ids
    assert 2 in ids


def test_chunk_spans_is_zero_shuffle_generate(spark):
    plan = (
        CUR.chunk_spans(_mk_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def _py_pack(docs, budget: int, n_buckets: int):
    rows = []
    for doc_id, text in docs:
        n_tok = len([w for w in text.split() if w])
        key = f"pack:{doc_id}"
        rows.append(
            (
                v32_py(key) % n_buckets,
                hashlib.md5(key.encode()).hexdigest(),
                doc_id,
                n_tok,
            )
        )
    out = {}
    for bucket in sorted({r[0] for r in rows}):
        cum = 0
        for b, h, doc_id, n_tok in sorted(r for r in rows if r[0] == bucket):
            start = cum
            cum += n_tok
            end = max(cum - 1, start)
            out[doc_id] = (
                bucket,
                start // budget,
                start % budget,
                n_tok,
                end // budget - start // budget + 1,
            )
    return out


def test_pack_plan_matches_python_twin(spark):
    for budget, n_buckets in [(512, 8), (50, 1), (7, 3)]:
        got = {
            r.doc_id: (
                r.bucket,
                r.bin_id,
                r.offset_in_bin,
                r.n_tok,
                r.bins_spanned,
            )
            for r in CUR.pack_plan(
                _mk_docs(spark), budget=budget, n_buckets=n_buckets
            ).collect()
        }
        assert got == _py_pack(DOCS, budget, n_buckets), (budget, n_buckets)


def test_pack_plan_streams_are_contiguous(spark):
    """Within a bucket the docs tile the token stream with no gaps or
    overlaps: offsets recompute from the cumulative sum of n_tok in
    (md5, doc_id) order."""
    rows = CUR.pack_plan(_mk_docs(spark), budget=50, n_buckets=2).collect()
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, rs in by_bucket.items():
        rs.sort(
            key=lambda r: (
                hashlib.md5(f"pack:{r.doc_id}".encode()).hexdigest(),
                r.doc_id,
            )
        )
        cum = 0
        for r in rs:
            assert r.bin_id == cum // 50 and r.offset_in_bin == cum % 50, r
            cum += r.n_tok


def test_pack_plan_is_one_exchange_window(spark):
    plan = (
        CUR.pack_plan(_mk_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def _py_rarity(docs, rare_max: int):
    from collections import Counter

    toks = {d: [w for w in t.split() if w] for d, t in docs}
    corpus = Counter(w for ws in toks.values() for w in ws)
    total = sum(corpus.values())
    out = {}
    for d, ws in toks.items():
        n = len(ws)
        sum_cnt = sum(corpus[w] for w in ws)
        rare = sum(1 for w in ws if corpus[w] <= rare_max)
        out[d] = (
            n,
            sum_cnt,
            rare / n if n else 0.0,
            sum_cnt / (n * total) if n else 0.0,
        )
    return out


def test_rarity_stats_matches_python_twin(spark):
    got = {
        r.doc_id: (r.n_words, r.sum_corpus_cnt, r.rare_frac, r.avg_rel_freq)
        for r in TX.rarity_stats(_mk_docs(spark), rare_max=2).collect()
    }
    assert got == _py_rarity(DOCS, 2)


def test_rarity_keeps_zero_token_docs_with_zero_stats(spark):
    got = {r.doc_id: r for r in TX.rarity_stats(_mk_docs(spark)).collect()}
    assert set(got) == {d for d, _ in DOCS}
    for d in (0, 1):
        r = got[d]
        assert (r.n_words, r.sum_corpus_cnt, r.rare_frac, r.avg_rel_freq) == (
            0,
            0,
            0.0,
            0.0,
        )


def test_rarity_all_empty_corpus_keeps_every_doc(spark):
    """Regression: the rollup-based vocab emits ZERO rows over an empty
    tf (unlike a global agg's single NULL row), and a 0-row total side
    would annihilate the crossJoin — every doc row vanished instead of
    reporting the documented zeros."""
    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "\t")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in TX.rarity_stats(docs).collect()}
    assert set(got) == {0, 1, 2}
    for r in got.values():
        assert (r.n_words, r.sum_corpus_cnt, r.rare_frac, r.avg_rel_freq) == (
            0,
            0,
            0.0,
            0.0,
        )


def _random_corpus(seed: int, n_docs: int = 40):
    """Random word-soup docs: skewed vocab, lengths 0..~120 (empty and
    single-token docs guaranteed present)."""
    import random

    rnd = random.Random(seed)
    vocab = [f"v{i}" for i in range(30)]
    docs = [(0, ""), (1, vocab[0])]
    for d in range(2, n_docs):
        n = rnd.choice([0, 1, 2, rnd.randrange(120), rnd.randrange(120)])
        docs.append((d, " ".join(rnd.choice(vocab) for _ in range(n))))
    return docs


def test_tokprep_property_sweep(spark):
    """Seeded sweep (x3 corpora): chunking, packing, and rarity all
    equal their pure-Python twins on random corpora with random
    operator parameters."""
    import random

    for seed in (11, 42, 97):
        docs = _random_corpus(seed)
        sdf = spark.createDataFrame(docs, ["doc_id", "text"])
        rnd = random.Random(seed * 7)
        chunk = rnd.randrange(1, 40)
        stride = rnd.randrange(1, 40)
        got_ch = sorted(
            tuple(r)
            for r in CUR.chunk_spans(
                sdf, chunk_tokens=chunk, stride=stride
            ).collect()
        )
        assert got_ch == _py_chunks(docs, chunk, stride), (seed, chunk, stride)

        budget = rnd.randrange(1, 200)
        n_buckets = rnd.randrange(1, 6)
        got_pk = {
            r.doc_id: (r.bucket, r.bin_id, r.offset_in_bin, r.n_tok, r.bins_spanned)
            for r in CUR.pack_plan(sdf, budget=budget, n_buckets=n_buckets).collect()
        }
        assert got_pk == _py_pack(docs, budget, n_buckets), (seed, budget, n_buckets)

        spans = CUR.pack_spans(sdf, budget=budget, n_buckets=n_buckets).collect()
        by_doc: dict[int, list] = {}
        for r in spans:
            by_doc.setdefault(r.doc_id, []).append(r)
        exp_pack = _py_pack(docs, budget, n_buckets)
        for doc_id, rs in by_doc.items():
            rs.sort(key=lambda r: r.doc_offset)
            pos = 0
            for r in rs:
                assert r.doc_offset == pos and 0 < r.piece_tokens <= budget
                assert 0 <= r.offset_in_bin < budget
                pos += r.piece_tokens
            assert pos == exp_pack[doc_id][3], (seed, doc_id)
        assert set(by_doc) == {
            d for d, v in exp_pack.items() if v[3] > 0
        }, seed

        rare_max = rnd.randrange(1, 5)
        got_ra = {
            r.doc_id: (r.n_words, r.sum_corpus_cnt, r.rare_frac, r.avg_rel_freq)
            for r in TX.rarity_stats(sdf, rare_max=rare_max).collect()
        }
        assert got_ra == _py_rarity(docs, rare_max), (seed, rare_max)


SRC_DOCS = [
    (0, "s0", ""),
    (1, "s0", "a b c d"),
    (2, "s0", "a b"),
    (3, "s0", "a b c d e f g h"),
    (4, "s1", "q"),
    (5, "s1", "q r s t u v"),
    (6, "s2", "m m m"),
]


def _mk_src_docs(spark):
    return spark.createDataFrame(SRC_DOCS, ["doc_id", "source", "text"])


def test_length_profile_matches_python_twin(spark):
    import math

    got = {
        r.source: (
            r.n_docs,
            r.total_words,
            r.min_words,
            r.max_words,
            r.p10,
            r.p50,
            r.p90,
        )
        for r in TX.length_profile(_mk_src_docs(spark)).collect()
    }
    exp = {}
    by_src: dict[str, list] = {}
    for doc_id, src, text in SRC_DOCS:
        by_src.setdefault(src, []).append((len(text.split()), doc_id))
    for src, lens in by_src.items():
        lens.sort()
        vals = [n for n, _ in lens]
        n = len(vals)
        pick = lambda q: vals[  # noqa: E731 — engine's integer-exact rule
            (int(round(q * 1_000_000)) * n + 999_999) // 1_000_000 - 1
        ]
        exp[src] = (
            n,
            sum(vals),
            min(vals),
            max(vals),
            pick(0.1),
            pick(0.5),
            pick(0.9),
        )
    assert got == exp


def test_mixture_plan_uniform_reduces_to_min_over_tokens(spark):
    rows = {r.source: r for r in CUR.mixture_plan(_mk_src_docs(spark)).collect()}
    toks = {"s0": 14, "s1": 7, "s2": 3}
    assert {s: r.tokens for s, r in rows.items()} == toks
    for s, r in rows.items():
        assert r.target_weight == 1.0 / 3
        assert r.keep_rate == 3 / toks[s]
        assert r.kept_tokens == int(toks[s] * (3 / toks[s]))
    # the minimum source keeps everything
    assert rows["s2"].keep_rate == 1.0
    # integer percent for sample_by_hash (round-half-up)
    for s, r in rows.items():
        assert r.keep_rate_pct == int(r.keep_rate * 100 + 0.5)


def test_mixture_plan_explicit_weights_cap_and_drop(spark):
    # s1 double weight, s2 absent -> dropped (rate 0); rates capped at 1
    rows = {
        r.source: r
        for r in CUR.mixture_plan(
            _mk_src_docs(spark), weights={"s0": 0.5, "s1": 0.5}
        ).collect()
    }
    # C = min(14/0.5, 7/0.5) = 14 -> s0: 14*0.5/14 = 0.5, s1: 14*0.5/7 = 1.0
    assert rows["s0"].keep_rate == 0.5
    assert rows["s1"].keep_rate == 1.0
    assert rows["s2"].keep_rate == 0.0 and rows["s2"].kept_tokens == 0
    assert rows["s1"].keep_rate_pct == 100 and rows["s2"].keep_rate_pct == 0


def test_mixture_plan_rejects_empty_weights(spark):
    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        CUR.mixture_plan(_mk_src_docs(spark), weights={})


def test_length_profile_approx_within_rank_bound(spark):
    """The sketch path reports, per group and quantile, a value whose
    TRUE rank is within the GK error bound of the target rank."""
    import math

    rows = TX.length_profile_approx(_mk_src_docs(spark)).collect()
    by_src: dict[str, list] = {}
    for doc_id, src, text in SRC_DOCS:
        by_src.setdefault(src, []).append(len(text.split()))
    for r in rows:
        vals = sorted(by_src[r.source])
        n = len(vals)
        assert r.n_docs == n and r.total_words == sum(vals)
        assert r.min_words == vals[0] and r.max_words == vals[-1]
        err = max(1, n // 10_000)
        for q, got in ((0.1, r.p10), (0.5, r.p50), (0.9, r.p90)):
            assert got in vals, (r.source, q, got)
            lo = min(i for i, v in enumerate(vals) if v == got) + 1
            hi = max(i for i, v in enumerate(vals) if v == got) + 1
            target = (int(round(q * 1_000_000)) * n + 999_999) // 1_000_000
            assert lo - err <= target <= hi + err or abs(
                min(abs(lo - target), abs(hi - target))
            ) <= err, (r.source, q, got, lo, hi, target)


def test_decontaminate_overlap_catches_partial_containment(spark):
    """A benchmark question quoted inside a LONG corpus page must score
    1.0 (normalization is by the benchmark doc's shingles — the corpus
    doc's length must not dilute containment); one-shingle brushes stay
    below threshold, unrelated pages and empty docs never pair."""
    bench_text = "what is the capital of france and why"
    long_page = (
        "intro words here " + bench_text + " trailing commentary text "
        + " ".join(f"filler{i}" for i in range(500))
    )
    corpus = spark.createDataFrame(
        [
            (1, long_page),  # full quote inside a 500+-word page
            (2, "completely different content about sorting networks"),
            (3, "what is the purpose of tests"),  # one shared shingle
            (4, ""),  # zero-word doc: excluded, never pairs
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, bench_text), (101, "   ")], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.bench_id): r
        for r in CUR.decontaminate_overlap(
            corpus, bench, min_overlap=0.5
        ).collect()
    }
    assert set(got) == {(1, 100)}
    r = got[(1, 100)]
    # all 6 benchmark shingles occur in the page -> full containment
    assert r.n_common == 6 and r.bench_shingles == 6
    assert r.overlap_frac == 1.0


def test_mixture_plan_composes_with_sample_by_hash(spark):
    """The documented composition: keep_rate_pct drives sample_by_hash
    and the realized kept-token fraction lands near the plan's
    keep_rate (hash draw is exact only in expectation)."""
    import random

    rnd = random.Random(5)
    rows = [
        (i, "s_big" if i < 400 else "s_small",
         " ".join(rnd.choice("abcdefgh") for _ in range(20)))
        for i in range(500)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    plan = {r.source: r for r in CUR.mixture_plan(docs).collect()}
    assert plan["s_small"].keep_rate_pct == 100
    pct_big = plan["s_big"].keep_rate_pct
    assert pct_big == int(plan["s_big"].keep_rate * 100 + 0.5)
    kept = CUR.sample_by_hash(
        docs.filter(F.col("source") == "s_big"), int(pct_big)
    ).count()
    frac = kept / 400
    assert abs(frac - plan["s_big"].keep_rate) < 0.12, (frac, plan["s_big"])


def test_pack_spans_tile_docs_and_windows_exactly(spark):
    """Pieces reassemble every doc exactly (offsets 0..n_tok contiguous)
    and tile every window: per (bucket, bin) piece tokens sum to the
    window budget except the last window of each bucket stream."""
    budget = 50
    spans = CUR.pack_spans(_mk_docs(spark), budget=budget, n_buckets=2).collect()
    plan = {
        r.doc_id: r
        for r in CUR.pack_plan(_mk_docs(spark), budget=budget, n_buckets=2).collect()
    }
    # per-doc reassembly
    by_doc: dict[int, list] = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.doc_offset)
        pos = 0
        for r in rs:
            assert r.doc_offset == pos, (doc_id, rs)
            pos += r.piece_tokens
        assert pos == plan[doc_id].n_tok
    assert set(by_doc) == {d for d, r in plan.items() if r.n_tok > 0}
    # per-window tiling
    fill: dict[tuple, int] = {}
    last_bin: dict[int, int] = {}
    for r in spans:
        fill[(r.bucket, r.bin_id)] = fill.get((r.bucket, r.bin_id), 0) + r.piece_tokens
        last_bin[r.bucket] = max(last_bin.get(r.bucket, -1), r.bin_id)
    for (bucket, bin_id), tokens in fill.items():
        if bin_id < last_bin[bucket]:
            assert tokens == budget, (bucket, bin_id, tokens)
        else:
            assert 0 < tokens <= budget
    # offsets inside a window are consistent with the stream order
    for r in spans:
        assert 0 <= r.offset_in_bin < budget
        assert r.offset_in_bin + r.piece_tokens <= budget


def test_mixture_plan_zero_token_source_neither_poisons_nor_crashes(spark):
    """An all-empty source gets keep_rate 0 (nothing to keep) and must
    not zero out every other source's rate or emit NULL percents."""
    docs = spark.createDataFrame(
        SRC_DOCS + [(7, "s_empty", ""), (8, "s_empty", "   ")],
        ["doc_id", "source", "text"],
    )
    uni = {r.source: r for r in CUR.mixture_plan(docs).collect()}
    assert uni["s_empty"].keep_rate == 0.0 and uni["s_empty"].keep_rate_pct == 0
    assert uni["s2"].keep_rate == 1.0  # min over POSITIVE-token sources
    assert all(r.keep_rate_pct is not None for r in uni.values())
    wtd = {
        r.source: r
        for r in CUR.mixture_plan(
            docs, weights={"s0": 0.4, "s1": 0.4, "s_empty": 0.2}
        ).collect()
    }
    assert wtd["s_empty"].keep_rate == 0.0
    assert wtd["s0"].keep_rate > 0.0 and wtd["s1"].keep_rate > 0.0


def test_guards_reject_silent_wrong_usage(spark):
    import pytest

    from flink_project_spark.llm import dedup as DD

    docs = _mk_src_docs(spark)
    with pytest.raises(ValueError, match="WHOLE percent"):
        CUR.sample_by_hash(docs, 0.5)
    with pytest.raises(ValueError, match="threshold must be > 0"):
        DD.near_dup_pairs(docs, threshold=0.0)
    sim = DD.doc_simhash(docs)
    with pytest.raises(ValueError, match="max_hamming"):
        DD.simhash_near_dups(sim, max_hamming=4)
    # combo-count budget: an explicit blocks whose C(blocks, anchor)
    # would blow the generated-code limit is a hard error, not a silent
    # interpreted fallback
    with pytest.raises(ValueError, match="anchor subsets"):
        DD.simhash_near_dups(sim, blocks=11)
    # blocks=0 is a config error, not 'use the default'
    with pytest.raises(ValueError, match="blocks"):
        DD.simhash_near_dups(sim, blocks=0)


def test_simhash_legacy_wide_bands_still_work(spark):
    """bands=16 was a valid t=1 pigeonhole config before the
    combination-banding rewrite (16 two-bit slices); the auto block
    chooser must map it to an equivalent-guarantee scheme instead of
    raising — and the results must equal the default scheme's."""
    from flink_project_spark.llm import dedup as DD

    docs = _mk_src_docs(spark)
    sim = DD.doc_simhash(docs)
    wide = {tuple(r) for r in DD.simhash_near_dups(sim, bands=16).collect()}
    default = {tuple(r) for r in DD.simhash_near_dups(sim).collect()}
    assert wide == default


def test_winnow_fingerprints_matches_python_twin(spark):
    """Winnowing (MOSS) twin check incl. short docs (< window shingles
    keep one global-min fingerprint) and the guarantee that any shared
    run of >= n + window - 1 words shares a fingerprint."""

    def twin(docs, n, w):
        out = {}
        for doc_id, text in docs:
            ws = [x for x in text.split() if x]
            k = max(len(ws) - (n - 1), 1)
            grams = [" ".join(ws[i : i + n]) for i in range(k)]
            hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
            starts = range(max(len(hs) - w + 1, 1))
            fps = sorted({min(hs[i : i + w]) for i in starts})
            out[doc_id] = (len(hs), len(fps), fps[0])
        return out

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 words >= 3+4-1
    docs = [
        (0, ""),
        (1, "one"),
        (2, "one two three"),  # 1 shingle
        (3, "a b c d e f"),    # 4 shingles = exactly one window
        (4, "x " * 30 + shared + " y z w v u t s"),
        (5, "prefix words here " + shared + " other suffix tail words"),
        (6, " ".join(f"t{i}" for i in range(40))),
    ]
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    for n, w in [(3, 4), (2, 3), (3, 1)]:
        got = {
            r.doc_id: (r.n_shingles, r.n_fingerprints, r.min_fp)
            for r in TX.winnow_fingerprints(sdf, n=n, window=w).collect()
        }
        assert got == twin(docs, n, w), (n, w)

    # containment guarantee: docs 4 and 5 share the 7-word run, so
    # their winnowed fingerprint SETS intersect
    def fp_set(doc_id):
        ws = [x for x in docs[doc_id][1].split() if x]
        grams = [" ".join(ws[i : i + 3]) for i in range(max(len(ws) - 2, 1))]
        hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
        return {min(hs[i : i + 4]) for i in range(max(len(hs) - 3, 1))}

    assert fp_set(4) & fp_set(5)


def test_shared_tf_paths_equal_direct_paths(spark):
    """word_counts/top_terms/rarity_stats with a precomputed
    doc_word_tf frame return exactly what the direct path returns —
    the contract layer's shared-intermediate wiring must not change
    any result."""
    from flink_project_spark.llm import text as TX

    docs = spark.createDataFrame(
        [
            (1, "a b b c"),
            (2, "b c c d d d"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    tf = TX.doc_word_tf(docs)
    for direct, shared in [
        (TX.word_counts(docs), TX.word_counts(docs, tf=tf)),
        (TX.top_terms(docs, k=2), TX.top_terms(docs, k=2, tf=tf)),
        (
            TX.rarity_stats(docs, rare_max=1),
            TX.rarity_stats(docs, rare_max=1, tf=tf),
        ),
    ]:
        assert direct.columns == shared.columns
        assert sorted(map(tuple, direct.collect())) == sorted(
            map(tuple, shared.collect())
        )


def test_mixture_temperature_matches_python_twin(spark):
    """alpha=0.5 smoothing: targets proportional to quantized sqrt(T);
    the binding (smallest-ratio) source keeps everything, and smaller
    sources get LARGER target shares than proportional sampling."""
    import math

    rows = {
        r.source: r
        for r in CUR.mixture_temperature(_mk_src_docs(spark)).collect()
    }
    toks = {"s0": 14, "s1": 7, "s2": 3}
    pwq = {s: math.floor(math.sqrt(t) * 1000000) for s, t in toks.items()}
    sum_pwq = sum(pwq.values())
    tw = {s: pwq[s] / sum_pwq for s in toks}
    c = min(toks[s] / tw[s] for s in toks)
    for s, r in rows.items():
        assert r.tokens == toks[s]
        assert r.target_weight == tw[s]
        assert r.keep_rate == min(1.0, c * tw[s] / toks[s])
        assert r.kept_tokens == math.floor(toks[s] * r.keep_rate)
    # sqrt smoothing: the smallest source's share exceeds its
    # proportional share, the largest source's falls below it
    total = sum(toks.values())
    assert tw["s2"] > toks["s2"] / total
    assert tw["s0"] < toks["s0"] / total
    # exactly one source binds at keep_rate 1.0 (no upsampling)
    assert sum(1 for r in rows.values() if r.keep_rate == 1.0) == 1


def test_token_budget_sample_caps_each_source(spark):
    """Every kept doc's PREDECESSOR sum is under budget, the crossing
    doc is admitted, everything later in md5 order is cut, and a
    too-small budget still keeps the first doc per source."""
    docs = _mk_src_docs(spark)
    out = CUR.token_budget_sample(docs, budget=5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) == {"s0", "s1", "s2"}
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r.cum_tokens)
        for r in rows:
            assert r.cum_tokens - r.n_tokens < 5
    # budget=1: exactly the first-in-hash-order doc per source survives
    first = CUR.token_budget_sample(docs, budget=1).collect()
    per_src = {}
    for r in first:
        per_src[r.source] = per_src.get(r.source, 0) + 1
        assert r.cum_tokens == r.n_tokens
    assert per_src == {"s0": 1, "s1": 1, "s2": 1}
    # determinism: same salt -> identical kept set across runs
    a = {r.doc_id for r in CUR.token_budget_sample(docs, budget=5).collect()}
    b = {r.doc_id for r in CUR.token_budget_sample(docs, budget=5).collect()}
    assert a == b
    # a different salt is an INDEPENDENT deterministic draw: it still
    # satisfies the budget rule, and repeating it reproduces itself
    alt = CUR.token_budget_sample(docs, budget=5, salt="other").collect()
    for r in alt:
        assert r.cum_tokens - r.n_tokens < 5
    alt2 = {
        r.doc_id
        for r in CUR.token_budget_sample(docs, budget=5, salt="other").collect()
    }
    assert {r.doc_id for r in alt} == alt2
    # the salt actually reaches the hash: salt='redraw' provably
    # reorders this fixture (computed from the md5 rule directly:
    # default admits s0 doc 2 / s1 doc 4 first, 'redraw' admits
    # s0 doc 1 / s1 doc 5 first)
    first_alt = {
        (r.source, r.doc_id)
        for r in CUR.token_budget_sample(docs, budget=1, salt="redraw").collect()
    }
    first_default = {
        (r.source, r.doc_id)
        for r in CUR.token_budget_sample(docs, budget=1).collect()
    }
    assert first_alt != first_default
    assert ("s0", 1) in first_alt and ("s0", 2) in first_default


def test_token_budget_sample_bucketed_bounds(spark):
    """n_buckets > 1 (the hot-source escape hatch): per-source kept
    tokens stay within n_buckets crossing-docs of the exact budget,
    every kept doc satisfies its bucket's rule, and the draw stays
    deterministic."""
    import random

    rnd = random.Random(3)
    rows = [
        (i, "big", " ".join(f"t{j}" for j in range(rnd.randint(5, 15))))
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    budget = 300
    nb = 4
    kept = CUR.token_budget_sample(docs, budget, n_buckets=nb).collect()
    kept_b = CUR.token_budget_sample(docs, budget, n_buckets=1).collect()
    tok = {r[0]: len(r[2].split()) for r in rows}
    max_doc = max(tok.values())
    total_bucketed = sum(r.n_tokens for r in kept)
    total_exact = sum(r.n_tokens for r in kept_b)
    # exact path: budget .. budget + one crossing doc
    assert budget <= total_exact < budget + max_doc
    # bucketed: within one crossing doc PER BUCKET, and at least the
    # budget minus one undershoot per bucket (a bucket can stop short
    # only if its stream ran dry — not here, big source)
    assert budget <= total_bucketed < budget + nb * max_doc
    # determinism
    again = {r.doc_id for r in CUR.token_budget_sample(docs, budget, n_buckets=nb).collect()}
    assert again == {r.doc_id for r in kept}
    # n_buckets=1 path unchanged by the refactor
    assert {r.doc_id for r in kept_b} == {
        r.doc_id for r in CUR.token_budget_sample(docs, budget).collect()
    }
