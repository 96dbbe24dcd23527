"""AUC/UAUC tie-handling hardening (SURVEY §7.3 hard part (a)).

The reference walks sorted groups accumulating same-score runs
(AucCalcVersion5.java:312-340); our closed form must equal the
pairwise Mann-Whitney definition AUC = (#[p>n] + 0.5*#[p==n]) / (P*N)
including deliberate score ties.
"""

from __future__ import annotations

import itertools
import random

from flink_project_spark.operators import auc as A


def _pairwise_auc(rows):
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    if not pos or not neg:
        return None
    num = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(pos, neg)
    )
    return num / (len(pos) * len(neg))


def test_auc_with_deliberate_ties(spark):
    rows = [(0.5, 1), (0.5, 1), (0.9, 1), (0.5, 0), (0.1, 0), (0.9, 0)]
    df = spark.createDataFrame(
        [("g", s, y) for s, y in rows], "k string, score double, label int"
    )
    got = A.auc(df, ["k"]).collect()[0]
    assert got.positives == 3 and got.negatives == 3
    assert abs(got.auc - 5.5 / 9.0) < 1e-12
    assert abs(got.auc - _pairwise_auc(rows)) < 1e-12


def test_auc_matches_pairwise_on_random_tied_data(spark):
    rng = random.Random(7)
    groups = {}
    data = []
    for g in ("a", "b", "c"):
        rows = [
            (rng.choice([0.1, 0.3, 0.3, 0.7, 0.9]), rng.randint(0, 1))
            for _ in range(40)
        ]
        groups[g] = rows
        data += [(g, s, y) for s, y in rows]
    df = spark.createDataFrame(data, "k string, score double, label int")
    got = {r.k: r.auc for r in A.auc(df, ["k"]).collect()}
    for g, rows in groups.items():
        expected = _pairwise_auc(rows)
        if expected is None:
            assert got[g] is None
        else:
            assert abs(got[g] - expected) < 1e-12, (g, got[g], expected)


def test_auc_one_sided_group_is_null(spark):
    df = spark.createDataFrame(
        [("g", 0.4, 1), ("g", 0.6, 1)], "k string, score double, label int"
    )
    got = A.auc(df, ["k"]).collect()[0]
    assert got.auc is None and got.positives == 2 and got.negatives == 0


def test_auc_null_scores_excluded_and_uauc_null_keys_kept(spark):
    """NULL scores are excluded from the rank statistic (engines sort
    NULLs in opposite directions — keeping them would make AUC
    engine-dependent), and a NULL key group survives into uauc via the
    null-safe weight join instead of silently vanishing."""
    from flink_project_spark.operators.auc import auc, uauc

    rows = [
        # group "g": one NULL score alongside real ones
        ("g", "u1", 0.9, 1), ("g", "u1", 0.1, 0), ("g", "u1", None, 0),
        # NULL group key: auc defined for its user
        (None, "u2", 0.8, 1), (None, "u2", 0.2, 0),
    ]
    df = spark.createDataFrame(
        rows, "k string, user_id string, score double, label int"
    )
    got = {r.k: (r.positives, r.negatives, r.auc) for r in auc(df, ["k"]).collect()}
    assert got["g"] == (1, 1, 1.0)  # the NULL-score negative is excluded
    assert got[None] == (1, 1, 1.0)
    u = {r.k: (r.users, r.uauc) for r in uauc(df, ["k"]).collect()}
    assert u[None] == (1, 1.0)  # null-key group kept, weight joined
    assert u["g"][0] == 1


def test_uauc_from_counts_fused_matches_composed(spark):
    """Round-8 pin: the fused single-pass `uauc_from_counts` (per-user
    AUC + weight in ONE window/aggregate pass, no weights join) must
    equal the composed form — `auc_from_counts` over the NULL-score-
    filtered counts, a separate per-user weight sum, and the null-safe
    `_weighted_user_mean` join — on a fixture that exercises every
    branch the join used to handle: NULL scores (weight-bearing,
    rank-excluded), an ALL-NULL-score user (weight but no AUC), a
    zero-weight user with a valid AUC, a one-sided user (no AUC), and
    a NULL group key."""
    from pyspark.sql import functions as F

    from flink_project_spark.operators.auc import (
        _weighted_user_mean,
        auc_from_counts,
        uauc_from_counts,
    )

    rows = [
        # (k, user, score, label, action)
        ("g", "u1", 0.9, 1, "show"), ("g", "u1", 0.1, 0, "show"),
        ("g", "u1", None, 0, "show"),          # NULL score, has weight
        ("g", "u2", 0.8, 1, "click"), ("g", "u2", 0.2, 0, "click"),
        #   u2: valid AUC but ZERO 'show' weight -> stays at w=0
        ("g", "u3", None, 1, "show"),          # ALL-NULL-score user
        ("g", "u4", 0.7, 1, "show"),           # one-sided -> no AUC
        (None, "u5", 0.6, 1, "show"), (None, "u5", 0.4, 0, "show"),
    ]
    df = spark.createDataFrame(
        rows, "k string, user_id string, score double, label int, "
        "action string"
    )
    counts = df.groupBy("k", "user_id", "score").agg(
        F.sum("label").alias("p_s"),
        F.sum(F.lit(1) - F.col("label")).alias("n_s"),
        F.count_if(F.col("action") == "show").alias("w_s"),
    )
    def _key(t):
        return (t[0] is None, t[0] or "", t[1:])

    fused = sorted(
        map(tuple, uauc_from_counts(counts, ["k"]).collect()), key=_key
    )
    per_user = auc_from_counts(
        counts.filter(F.col("score").isNotNull()), ["k", "user_id"]
    )
    weights = counts.groupBy("k", "user_id").agg(F.sum("w_s").alias("w"))
    composed = sorted(
        map(
            tuple,
            _weighted_user_mean(per_user, weights, ["k"], "user_id")
            .collect(),
        ),
        key=_key,
    )
    assert fused == composed
    # spot values: group g keeps u1 (w=3, auc=1.0) and u2 (w=0) ->
    # users=2, uauc = 3*1.0/3; NULL key group kept
    got = {t[0]: t[1:] for t in fused}
    assert got["g"] == (2, 1.0)
    assert got[None] == (1, 1.0)
