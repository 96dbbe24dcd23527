"""Hypothesis property tests: engine results vs independent pure-python
twins on ADVERSARIALLY-GENERATED inputs (SURVEY §5's twin strategy,
extended from seeded-random fixtures to shrinking property search).

Example counts are deliberately small (each example runs Spark jobs);
`derandomize=True` makes every CI run execute the identical example
set, so a failure here is reproducible, not flaky.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

PROP = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)

# small pools keep pair/bucket collisions frequent (the interesting case)
_ITEMS = ["A", "B", "C", "D"]
_USERS = ["u1", "u2"]

actions_strategy = st.lists(
    st.tuples(
        st.sampled_from(_USERS),
        st.sampled_from(_ITEMS),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=1,
    max_size=14,
)


@PROP
@given(actions_strategy)
def test_prop_decay_gated_matches_reference_loop(spark, rows):
    """decay_pairs_gated == ItemIdCfVersion5's max-gated emission loop
    (triple-distinct, sort by (ts, item), per-directed-pair max gate)
    on arbitrary small histories with repeats and ts ties."""
    import flink_project_spark.operators.itemcf as CF

    n = 2
    df = spark.createDataFrame(
        rows, "user_id string, item_id string, action_time long"
    )
    got = {
        (r["item_a"], r["item_b"]): (r["emissions"], r["decay_scaled"])
        for r in CF.decay_pairs_gated(df, n_distances=n).collect()
    }

    def quant(s: float) -> int:
        return int(math.floor(s * 1_000_000 + 0.5))

    expected: dict[tuple, list[int]] = {}
    by_user: dict[str, set] = {}
    for u, it, ts in rows:
        by_user.setdefault(u, set()).add((ts, it))  # triple distinct
    for evs in by_user.values():
        items = [it for _ts, it in sorted(evs)]
        gate: dict[str, list[float]] = {}
        for i in range(len(items) - 1):
            for j in range(i + 1, len(items)):
                a, b = items[i], items[j]
                if a == b:
                    continue
                d = j - i
                score = 1.0 if d <= n else math.exp((n - d) / (2 * n + 1))
                key = f"{a}_{b}"
                emits = []
                if key in gate:
                    arr = gate[key]
                    if arr[0] < score:
                        arr[0] = score
                        emits.append((a, b))
                    if arr[1] < score:
                        arr[1] = score
                        emits.append((b, a))
                else:
                    gate[key] = [score, score]
                    emits = [(a, b), (b, a)]
                for pair in emits:
                    e = expected.setdefault(pair, [0, 0])
                    e[0] += 1
                    e[1] += quant(score)
    assert got == {k: tuple(v) for k, v in expected.items()}


events_strategy = st.lists(
    st.tuples(
        st.sampled_from([1, 2]),  # user
        st.sampled_from(["view", "click", "purchase", "other"]),
        st.integers(min_value=0, max_value=12),  # seconds offset
    ),
    min_size=1,
    max_size=16,
)


@PROP
@given(events_strategy, st.sampled_from([None, 5]))
def test_prop_funnel_matches_greedy_walk(spark, rows, horizon):
    """funnel_times == the greedy earliest-qualifying-event walk on
    arbitrary event sets, with and without the t1-anchored horizon —
    including ts ties between steps (strict > chaining) and repeated
    step events."""
    from flink_project_spark.operators.funnel import funnel_times

    steps = ["view", "click", "purchase"]
    df = spark.createDataFrame(
        [(u, t, s) for u, t, s in rows],
        "user_id long, event_type string, s long",
    ).select(
        "user_id",
        "event_type",
        F.timestamp_seconds(F.col("s")).alias("ts"),
    )
    got = {
        r["user_id"]: [r["t1"], r["t2"], r["t3"]]
        for r in funnel_times(df, steps, horizon_seconds=horizon).collect()
    }

    by_user: dict[int, list] = {}
    for u, typ, s in rows:
        if typ in steps:
            by_user.setdefault(u, []).append((s, typ))
    expected = {}
    for u, evs in by_user.items():
        ts = [None] * len(steps)
        for t, typ in sorted(evs):
            i = steps.index(typ)
            if i == 0:
                if ts[0] is None:
                    ts[0] = t
            elif ts[i] is None and ts[i - 1] is not None and t > ts[i - 1]:
                if horizon is None or (t - ts[0]) <= horizon:
                    ts[i] = t
        if ts[0] is not None:
            expected[u] = ts
    got_s = {
        u: [None if t is None else int(t.timestamp()) for t in v]
        for u, v in got.items()
    }
    assert got_s == expected


sig_strategy = st.lists(
    st.integers(min_value=0, max_value=2**32 - 1),
    min_size=2,
    max_size=12,
)


@PROP
@given(sig_strategy, st.sampled_from([1, 3]), st.sampled_from([None, 5, 7]))
def test_prop_simhash_banding_is_exact(spark, sigs, max_hamming, blocks):
    """Combination-banded near-dup search == brute-force Hamming
    filter: the anchor-subset guarantee (<= max_hamming errors leave
    >= blocks - max_hamming clean blocks, one subset of which is
    enumerated) means banding NEVER misses a qualifying pair, and the
    exact post-filter kills every false candidate — so the result is
    EXACTLY the brute-force set on arbitrary full-width signatures
    (incl. identical/near-identical ones and UNEVEN block widths:
    32 bits over 5 or 7 blocks)."""
    from flink_project_spark.llm.dedup import simhash_near_dups

    bits, bands = 32, 4
    sim = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "doc_id long, simhash long"
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_dups(
            sim, bits=bits, bands=bands, max_hamming=max_hamming,
            blocks=blocks,
        ).collect()
    }
    want = {
        (a, b)
        for a in range(len(sigs))
        for b in range(a + 1, len(sigs))
        if bin(sigs[a] ^ sigs[b]).count("1") <= max_hamming
    }
    assert got == want


ranges_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=10),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=10),
        ),
        min_size=1,
        max_size=5,
    ),
)


@PROP
@given(ranges_strategy, st.booleans())
def test_prop_range_join_matches_brute_force(spark, data, hi_inclusive):
    """Bucketed range-join decomposition == the brute-force BETWEEN
    join on arbitrary integer values and (lo, width) ranges, both
    boundary inclusivities — including zero-width and overlapping
    ranges and values sitting exactly on bucket edges."""
    from flink_project_spark.operators.rangejoin import range_join_bucketed

    vals, rs = data
    facts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "fid long, v double"
    )
    ranges = spark.createDataFrame(
        [(i, float(lo), float(lo + w)) for i, (lo, w) in enumerate(rs)],
        "rid long, lo double, hi double",
    )
    got = {
        (r.fid, r.rid)
        for r in range_join_bucketed(
            facts,
            ranges,
            value_col="v",
            lo_col="lo",
            hi_col="hi",
            bucket_width=7.0,
            hi_inclusive=hi_inclusive,
        )
        .select("fid", "rid")
        .collect()
    }
    want = {
        (fi, ri)
        for fi, v in enumerate(vals)
        for ri, (lo, w) in enumerate(rs)
        if lo <= v and (v <= lo + w if hi_inclusive else v < lo + w)
    }
    assert got == want


impressions_strategy = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2"]),          # key group
        st.sampled_from(["u1", "u2", "u3"]),    # user
        st.integers(min_value=0, max_value=4),  # score bucket (ties!)
        st.integers(min_value=0, max_value=1),  # label
    ),
    min_size=1,
    max_size=20,
)


@PROP
@given(impressions_strategy)
def test_prop_auc_and_uauc_match_python_twin(spark, rows):
    """auc == the tie-corrected Mann-Whitney statistic and uauc == the
    impression-weighted mean of per-user AUCs (auc quantized to 1e-9
    int64 units, one-sided users excluded, zero-weight groups dropped)
    on arbitrary small impression logs heavy with score ties."""
    import flink_project_spark.operators.auc as A

    df = spark.createDataFrame(
        rows, "g string, user_id string, score int, label int"
    )

    def py_auc(recs):
        pos = [s for s, lb in recs if lb == 1]
        neg = [s for s, lb in recs if lb == 0]
        if not pos or not neg:
            return None
        num2 = 0  # 2*sum over positives of (#neg below + 0.5*#neg tied)
        for p in pos:
            num2 += 2 * sum(1 for n in neg if n < p)
            num2 += sum(1 for n in neg if n == p)
        return num2 / (2.0 * len(pos) * len(neg))

    by_g: dict[str, list] = {}
    for g, u, s, lb in rows:
        by_g.setdefault(g, []).append((u, s, lb))

    got_auc = {
        r["g"]: (r["positives"], r["negatives"], r["auc"])
        for r in A.auc(df, ["g"]).collect()
    }
    for g, recs in by_g.items():
        want = py_auc([(s, lb) for _u, s, lb in recs])
        p = sum(lb for _u, _s, lb in recs)
        n = len(recs) - p
        assert got_auc[g][0] == p and got_auc[g][1] == n
        if want is None:
            assert got_auc[g][2] is None
        else:
            assert abs(got_auc[g][2] - want) < 1e-12, (g, got_auc[g], want)

    got_uauc = {
        r["g"]: (r["users"], r["uauc"]) for r in A.uauc(df, ["g"]).collect()
    }
    expected_uauc = {}
    for g, recs in by_g.items():
        by_u: dict[str, list] = {}
        for u, s, lb in recs:
            by_u.setdefault(u, []).append((s, lb))
        terms = []
        users = 0
        for u, urecs in by_u.items():
            a = py_auc(urecs)
            if a is None:
                continue  # one-sided users excluded
            users += 1
            w = len(urecs)  # weight = impression count
            terms.append((w, math.floor(a * 1e9 + 0.5)))
        wtotal = sum(w for w, _ in terms)
        if wtotal:
            expected_uauc[g] = (
                users,
                sum(w * q for w, q in terms) / (1e9 * wtotal),
            )
    assert set(got_uauc) == set(expected_uauc)
    for g, (users, val) in expected_uauc.items():
        assert got_uauc[g][0] == users
        assert abs(got_uauc[g][1] - val) < 1e-12, (g, got_uauc[g], val)


retention_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),    # user
        st.integers(min_value=0, max_value=40),   # day offset from epoch-ish
    ),
    min_size=1,
    max_size=18,
)


@PROP
@given(retention_strategy, st.sampled_from(["day", "week", "month"]))
def test_prop_cohort_retention_matches_python_twin(spark, rows, period):
    """cohort_retention == the python first-period/offset twin for all
    three period units on arbitrary (user, day) activity sets."""
    import datetime as dt

    from flink_project_spark.operators.funnel import cohort_retention

    base = dt.datetime(2024, 1, 15, 12, 0, 0)
    data = [(u, base + dt.timedelta(days=d)) for u, d in rows]
    df = spark.createDataFrame(data, "user_id long, ts timestamp")
    got = {
        (str(r.cohort), r.period_offset): r.users
        for r in cohort_retention(df, period=period).collect()
    }

    def trunc(t: dt.datetime) -> dt.date:
        if period == "day":
            return t.date()
        if period == "week":
            d = t.date()
            return d - dt.timedelta(days=d.weekday())  # ISO Monday
        return t.date().replace(day=1)

    first: dict[int, dt.date] = {}
    for u, t in data:
        p = trunc(t)
        if u not in first or p < first[u]:
            first[u] = p
    pairs = set()
    for u, t in data:
        p = trunc(t)
        c = first[u]
        if period == "month":
            off = (p.year - c.year) * 12 + (p.month - c.month)
        else:
            days = 7 if period == "week" else 1
            off = (p - c).days // days
        pairs.add((u, c, off))
    expected: dict[tuple, int] = {}
    for _u, c, off in pairs:
        expected[(str(c), off)] = expected.get((str(c), off), 0) + 1
    assert got == expected


docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["red", "blue", "fox", "dog", "run", "sky"]),
        min_size=0,
        max_size=10,
    ),
    min_size=2,
    max_size=8,
)


@PROP
@given(docs_strategy)
def test_prop_minhash_pipeline_soundness(spark, word_lists):
    """near_dup_pairs is SOUND on arbitrary tiny corpora: every
    returned pair's exact 3-gram Jaccard really is >= threshold and
    matches the python set computation bit-for-bit (the LSH stage may
    MISS pairs — recall < 1 by design — but the verify stage must never
    pass a false one), and est_jaccard stays within [0, 1]."""
    from flink_project_spark.llm.dedup import near_dup_pairs

    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = near_dup_pairs(df, threshold=0.5, log_overflow=False).collect()

    def shingles(ws):
        if not ws:
            return set()
        if len(ws) < 3:
            return {" ".join(ws)}
        return {" ".join(ws[i: i + 3]) for i in range(len(ws) - 2)}

    sh = {i: shingles(ws) for i, ws in enumerate(word_lists)}
    for r in got:
        a, b = sh[r.doc_a], sh[r.doc_b]
        jac = len(a & b) / len(a | b)
        assert abs(jac - r.jaccard) < 1e-12, (r, jac)
        assert jac >= 0.5
        assert 0.0 <= r.est_jaccard <= 1.0


@PROP
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=5,
    )
)
def test_prop_strip_dup_spans_matches_python_twin(spark, word_lists):
    """strip_dup_spans == a python re-execution of the ExactSubstr rule
    (n=2 positional grams; a gram is dup iff its text occurs >1 time in
    the corpus incl. same-doc repeats; dup gram positions merge into
    islands; island tokens are removed) on arbitrary tiny corpora over
    a 3-word alphabet — maximal gram collisions and repeats."""
    from flink_project_spark.llm.dedup import strip_dup_spans

    n = 2
    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.kept_tokens, r.clean_text)
        for r in strip_dup_spans(df, n=n).collect()
    }

    # python twin of _positional_grams: docs with < n words emit their
    # single truncated gram at pos 0; empty docs emit none
    grams: dict[int, list] = {}
    for i, ws in enumerate(word_lists):
        if not ws:
            grams[i] = []
        elif len(ws) < n:
            grams[i] = [(0, " ".join(ws))]
        else:
            grams[i] = [
                (p, " ".join(ws[p: p + n])) for p in range(len(ws) - n + 1)
            ]
    counts: dict[str, int] = {}
    for g in grams.values():
        for _p, h in g:
            counts[h] = counts.get(h, 0) + 1
    expected = {}
    for i, ws in enumerate(word_lists):
        dup_pos = set()
        for p, h in grams[i]:
            if counts[h] > 1:
                # gram span = [p, p+n-1] clamped to the doc
                for x in range(p, min(p + n, len(ws)) if ws else 0):
                    dup_pos.add(x)
        kept = [w for x, w in enumerate(ws) if x not in dup_pos]
        expected[i] = (len(ws), len(kept), " ".join(kept))
    assert got == expected
