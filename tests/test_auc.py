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
