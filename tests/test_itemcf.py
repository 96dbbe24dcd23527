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


def test_decay_gated_matches_reference_loop_with_repeats(spark):
    """decay_pairs_gated re-executes ItemIdCfVersion5.java:147-192's
    max-gated emission on a history where users revisit items — the
    case the ungated variant documents as out of scope."""
    import math

    rows = [
        # user u1 revisits A and B: repeat pairs with improving and
        # non-improving distances exercise both gate branches
        ("u1", "A", 1), ("u1", "B", 2), ("u1", "A", 3),
        ("u1", "C", 4), ("u1", "B", 5), ("u1", "A", 6),
        # u2: monotone improvement for (X,Y): d=3 then d=1
        ("u2", "X", 1), ("u2", "Z", 2), ("u2", "W", 3),
        ("u2", "Y", 4), ("u2", "X", 5), ("u2", "Y", 6),
        # u3: repeat-free control
        ("u3", "A", 1), ("u3", "B", 2),
    ]
    n = 2
    df = spark.createDataFrame(
        rows, "user_id string, item_id string, action_time long"
    )
    got = {
        (r["item_a"], r["item_b"]): (r["emissions"], r["decay_scaled"])
        for r in CF.decay_pairs_gated(df, n_distances=n).collect()
    }

    # ---- reference loop, verbatim semantics (raw doubles) ----
    def quant(s: float) -> int:
        return int(math.floor(s * 1_000_000 + 0.5))

    expected: dict[tuple[str, str], list[int]] = {}
    by_user: dict[str, list[tuple[int, str]]] = {}
    for u, it, ts in rows:
        by_user.setdefault(u, []).append((ts, it))
    for u, evs in by_user.items():
        items = [it for ts, it in sorted(evs)]
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


def test_decay_gated_reduces_to_ungated_on_distinct_history(spark):
    """On a repeat-free history the gate never fires: gated sums equal
    the plain decay_pairs sums on the same positions."""
    rows = [("u%d" % u, "item_%d" % i, 100 + i) for u in range(3) for i in range(6)]
    df = spark.createDataFrame(
        rows, "user_id string, item_id string, action_time long"
    )
    gated = {
        (r["item_a"], r["item_b"]): r["decay_scaled"]
        for r in CF.decay_pairs_gated(df).collect()
    }
    hist = CF.user_item_history(df)
    plain = {
        (r["item_a"], r["item_b"]): r["decay_scaled"]
        for r in CF.decay_pairs(hist).collect()
    }
    assert gated == plain


def test_decay_gated_max_history_cap(spark):
    """(a) Under the cap the capped result is IDENTICAL to the uncapped
    one (the guard is inert on organic histories); (b) a user whose
    DEDUPED triple history exceeds the cap is dropped entirely — same
    drop semantics as user_item_history — so a mega-history user
    contributes no pairs."""
    rows = [
        ("u%d" % u, "item_%d" % i, 100 + i) for u in range(3) for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "user_id string, item_id string, action_time long"
    )

    def as_map(res):
        return {
            (r["item_a"], r["item_b"]): (r["emissions"], r["decay_scaled"])
            for r in res.collect()
        }

    assert as_map(CF.decay_pairs_gated(df, max_history=6)) == as_map(
        CF.decay_pairs_gated(df)
    )

    # add a bot user with 8 distinct triples (incl. repeats of the same
    # item at different times — the dedup counts TRIPLES, so it stays 8)
    bot = [("bot", "item_%d" % (i % 4), 200 + i) for i in range(8)]
    df2 = spark.createDataFrame(
        rows + bot, "user_id string, item_id string, action_time long"
    )
    capped = as_map(CF.decay_pairs_gated(df2, max_history=7))
    assert capped == as_map(CF.decay_pairs_gated(df))  # bot fully dropped
    assert as_map(CF.decay_pairs_gated(df2)) != capped  # it did contribute


def test_array_history_path_equals_row_path(spark):
    """The persisted-array pipeline (user_item_history_arrays ->
    history_from_arrays / decay_pairs_from_arrays) must reproduce the
    row-form operators exactly — it is the entry point's default."""
    va = FX.fixture_df(spark, SF_SMOKE, "valid_actions")
    arrays = CF.user_item_history_arrays(va, max_history=500)

    row_hist = CF.user_item_history(va, max_history=500).select(
        "user_id", "item_id", "first_time", "n_items"
    )
    arr_hist = CF.history_from_arrays(arrays).select(
        "user_id", "item_id", "first_time", "n_items"
    )
    assert row_hist.exceptAll(arr_hist).count() == 0
    assert arr_hist.exceptAll(row_hist).count() == 0

    row_pairs = CF.decay_pairs(CF.user_item_history(va, max_history=500)).select(
        "item_a", "item_b", "cooc", "decay_scaled"
    )
    arr_pairs = CF.decay_pairs_from_arrays(arrays).select(
        "item_a", "item_b", "cooc", "decay_scaled"
    )
    assert row_pairs.exceptAll(arr_pairs).count() == 0
    assert arr_pairs.exceptAll(row_pairs).count() == 0
