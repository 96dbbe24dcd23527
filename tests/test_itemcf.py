"""Item-CF invariants beyond the oracle checks: symmetry, decay-variant
consistency (exp vs scaled-integer), skew-guard behavior.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_project_spark import fixtures as FX
from flink_project_spark.operators import itemcf as CF
from tests.conftest import SF_SMOKE


def _history(spark):
    va = FX.fixture_df(spark, SF_SMOKE, "valid_actions")
    return CF.user_item_history(va, max_history=500)


def test_cooccurrence_symmetric(spark):
    pairs = CF.cooccurrence_pairs(_history(spark))
    a = pairs.select(
        F.col("item_a").alias("x"), F.col("item_b").alias("y"), "cooc"
    )
    b = pairs.select(
        F.col("item_b").alias("x"), F.col("item_a").alias("y"),
        F.col("cooc").alias("cooc2"),
    )
    diff = a.join(b, on=["x", "y"], how="full_outer").filter(
        (F.col("cooc").isNull())
        | (F.col("cooc2").isNull())
        | (F.col("cooc") != F.col("cooc2"))
    )
    assert diff.count() == 0


def test_cosine_scores_bounded(spark):
    h = _history(spark)
    scored = CF.cosine_scores(CF.cooccurrence_pairs(h), CF.item_user_counts(h))
    bad = scored.filter((F.col("score") <= 0) | (F.col("score") > 1.0000001))
    assert bad.count() == 0


def test_decay_quantized_matches_float_exp(spark):
    """The oracle-checked decay (driver-side quantized LUT) and the
    reference-faithful float exp form agree to the 1e-6 quantization
    step per summed term."""
    h = _history(spark)
    exact = CF.decay_pairs(h).select("item_a", "item_b", "decay_score", "cooc")
    expd = CF.decay_pairs_exp(h).select(
        "item_a", "item_b", F.col("decay_score").alias("exp_score")
    )
    j = exact.join(expd, on=["item_a", "item_b"], how="inner").collect()
    assert len(j) > 0
    for row in j:
        assert abs(row.exp_score - row.decay_score) <= row.cooc * 1e-5, row


def test_decay_exp_matches_reference_loop(spark):
    """Re-execute the reference's reduceGroup verbatim in Python
    (ItemIdCfVersion5.java:147-192: per user, items time-sorted; pair
    (i, j<i...) scores 1 if j-i <= n else exp((n-(j-i))/(2n+1)); both
    directions emitted; summed over users) and compare decay_pairs_exp.
    """
    import math
    from collections import defaultdict

    h = _history(spark)
    n = CF.DECAY_N_DISTANCES
    rows = h.select("user_id", "item_id", "first_time").collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.first_time, r.item_id))
    expected: dict = defaultdict(float)
    for items in by_user.values():
        items.sort()  # (first_time, item_id) — matches _with_positions
        ids = [i for _, i in items]
        for i in range(len(ids) - 1):
            for j in range(i + 1, len(ids)):
                d = j - i
                score = 1.0 if d <= n else math.exp((n - d) / (2 * n + 1))
                expected[(ids[i], ids[j])] += score
                expected[(ids[j], ids[i])] += score
    got = {
        (r.item_a, r.item_b): r.decay_score
        for r in CF.decay_pairs_exp(h).collect()
    }
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_max_history_cap_drops_heavy_users(spark):
    va = FX.fixture_df(spark, SF_SMOKE, "valid_actions")
    uncapped = CF.user_item_history(va, max_history=None)
    capped = CF.user_item_history(va, max_history=5)
    max_n = capped.agg(F.max("n_items")).collect()[0][0]
    assert max_n is None or max_n <= 5
    assert capped.count() <= uncapped.count()


def test_neighbor_lists_render_and_truncate(spark):
    h = _history(spark)
    scored = CF.cosine_scores(CF.cooccurrence_pairs(h), CF.item_user_counts(h))
    lists = CF.neighbor_lists(scored, k=3).collect()
    for row in lists:
        assert row.n_neighbors <= 3
        entries = row.neighbors.split(",")
        assert len(entries) == row.n_neighbors
        scores = [float(e.split(":")[1]) for e in entries]
        assert scores == sorted(scores, reverse=True)


def test_neighbor_lists_pre_truncate_path_identical(spark):
    """The skew-proof pre-truncated assembly renders the same lists,
    sizes, and totals as the plain collect-then-slice path."""
    actions = FX.fixture_df(spark, SF_SMOKE, "valid_actions")
    hist = CF.user_item_history(actions, max_history=500)
    scored = CF.cosine_scores(CF.cooccurrence_pairs(hist), CF.item_user_counts(hist))
    plain = {
        r.item_id: (r.neighbors, r.n_neighbors, r.total_candidates)
        for r in CF.neighbor_lists(scored, k=10, pre_truncate=False).collect()
    }
    salted = {
        r.item_id: (r.neighbors, r.n_neighbors, r.total_candidates)
        for r in CF.neighbor_lists(scored, k=10, pre_truncate=True).collect()
    }
    assert salted == plain and len(plain) > 0
