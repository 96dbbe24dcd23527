"""As-of join semantics: backward match, equal-time ties, tolerance
horizon, unmatched rows, payload columns, and equivalence with a
brute-force per-row scan on random data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_project_spark.operators.asof import asof_join, click_show_attribution


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", "i1", 100),
            ("u1", "i1", 50),
            ("u2", "i1", 10),   # no right match
            ("u1", "i2", 40),   # equal-time right match
        ],
        "u string, i string, t long",
    )
    right = spark.createDataFrame(
        [
            ("u1", "i1", 90, "a"),
            ("u1", "i1", 40, "b"),
            ("u1", "i1", 101, "late"),  # after every left t: never matched
            ("u1", "i2", 40, "c"),
        ],
        "u string, i string, t long, tag string",
    )
    return left, right


def test_asof_backward_and_equal_time_match(spark):
    left, right = _frames(spark)
    out = {
        (r["u"], r["i"], r["t"]): (r["t_m"], r["tag_m"])
        for r in asof_join(
            left, right, ["u", "i"], "t", "t", suffix="_m"
        ).collect()
    }
    assert out[("u1", "i1", 100)] == (90, "a")   # latest at-or-before 100
    assert out[("u1", "i1", 50)] == (40, "b")
    assert out[("u2", "i1", 10)] == (None, None)
    assert out[("u1", "i2", 40)] == (40, "c")    # equal time matches


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {
        (r["u"], r["i"], r["t"]): r["tag_m"]
        for r in asof_join(
            left, right, ["u", "i"], "t", "t", tolerance=5, suffix="_m"
        ).collect()
    }
    assert out[("u1", "i1", 100)] is None        # 100-90 > 5
    assert out[("u1", "i2", 40)] == "c"          # exact hit stays


def test_asof_matches_brute_force_on_random_data(spark):
    """Property check (seeded, x3): asof equals the per-row brute-force
    scan, with and without a tolerance horizon."""
    import random

    for seed in (7, 23, 91):
        rnd = random.Random(seed)
        lrows = [(f"k{rnd.randrange(5)}", rnd.randrange(1000)) for _ in range(200)]
        rrows = [
            (f"k{rnd.randrange(5)}", rnd.randrange(1000), j) for j in range(150)
        ]
        left = spark.createDataFrame(lrows, "k string, t long")
        right = spark.createDataFrame(rrows, "k string, t long, v long")
        for tol in (None, 100):
            got = {
                (r["k"], r["t"], i): r["t_m"]
                for i, r in enumerate(
                    asof_join(
                        left, right, ["k"], "t", "t", tolerance=tol, suffix="_m"
                    )
                    .orderBy("k", "t")
                    .collect()
                )
            }
            # brute force: max right t in [t - tol, t] per key
            exp = {}
            for i, (k, t) in enumerate(sorted(lrows)):
                cands = [
                    rt
                    for (rk, rt, _) in rrows
                    if rk == k and rt <= t and (tol is None or rt >= t - tol)
                ]
                exp[(k, t, i)] = max(cands) if cands else None
            assert got == exp, (seed, tol)


def test_click_show_attribution_counts(spark):
    va = spark.createDataFrame(
        [
            ("s0", "u1", "i1", "show", 100),
            ("s0", "u1", "i1", "click", 150),   # attributed, latency 50
            ("s0", "u1", "i1", "click", 90),    # click before any show
            ("s1", "u2", "i2", "click", 10),    # no show at all
            ("s1", "u3", "i3", "show", 5),
            ("s1", "u3", "i3", "show", 8),
            ("s1", "u3", "i3", "click", 9),     # latest show 8, latency 1
        ],
        "scene_id string, user_id string, item_id string, action string,"
        " action_time long",
    )
    out = {r["scene_id"]: r.asDict() for r in click_show_attribution(va).collect()}
    assert out["s0"]["n_clicks"] == 2
    assert out["s0"]["n_attributed"] == 1
    assert out["s0"]["sum_latency_ms"] == 50
    assert out["s1"]["n_clicks"] == 2
    assert out["s1"]["n_attributed"] == 1
    assert out["s1"]["sum_latency_ms"] == 1


def test_asof_single_exchange_plan(spark):
    """The as-of join itself adds exactly ONE hash exchange on the
    equality keys (plus whatever the inputs need) — the union-merge
    form never plans a non-equi join or cartesian."""
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, ["u", "i"], "t", "t")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_bucketed_asof_equals_plain_asof(spark):
    """The hot-key time-bucket variant returns the identical result to
    the plain form — on random data, across bucket widths (including
    widths that leave many empty buckets between matches), with and
    without tolerance."""
    import random

    from flink_project_spark.operators.asof import asof_join_bucketed

    rnd = random.Random(11)
    lrows = [(f"k{rnd.randrange(4)}", rnd.randrange(10_000)) for _ in range(300)]
    rrows = [
        (f"k{rnd.randrange(4)}", rnd.randrange(10_000), j) for j in range(200)
    ]
    left = spark.createDataFrame(lrows, "k string, t long")
    right = spark.createDataFrame(rrows, "k string, t long, v long")

    def result(df):
        return sorted(
            (r["k"], r["t"], r["t_m"], r["v_m"])
            for r in df.collect()
        )

    for tol in (None, 500):
        plain = result(
            asof_join(left, right, ["k"], "t", "t", tolerance=tol, suffix="_m")
        )
        for width in (100, 1000, 7919):
            bucketed = result(
                asof_join_bucketed(
                    left, right, ["k"], "t", "t",
                    bucket_width=width, tolerance=tol, suffix="_m",
                )
            )
            assert bucketed == plain, (tol, width)


def test_bucketed_asof_carry_crosses_empty_buckets(spark):
    from flink_project_spark.operators.asof import asof_join_bucketed

    left = spark.createDataFrame([("k", 9_999)], "k string, t long")
    right = spark.createDataFrame([("k", 5, 7)], "k string, t long, v long")
    # right sits ~1000 buckets before the left row at width 10
    r = asof_join_bucketed(
        left, right, ["k"], "t", "t", bucket_width=10, suffix="_m"
    ).collect()[0]
    assert (r["t_m"], r["v_m"]) == (5, 7)


def test_asof_null_right_time_never_matches(spark):
    """'at or before' is never true for an unknown time: a NULL
    right_time row must not match anything — in BOTH the plain and the
    bucketed form (they previously diverged here)."""
    from flink_project_spark.operators import asof as AS

    left = spark.createDataFrame([("k", 5)], "k string, t long")
    right = spark.createDataFrame(
        [("k", None, "nulltime"), ("k", 50, "real")],
        "k string, rt long, v string",
    )
    for fn, kw in (
        (AS.asof_join, {}),
        (AS.asof_join_bucketed, {"bucket_width": 10}),
    ):
        got = fn(left, right, on=["k"], left_time="t", right_time="rt",
                 **kw).collect()
        assert len(got) == 1
        assert got[0]["rt_matched"] is None, (fn.__name__, got)
        assert got[0]["v_matched"] is None, (fn.__name__, got)


def test_asof_rejects_payload_column_named_t(spark):
    """A right payload column literally named 't' collides with the
    internal matched-time struct field — rejected up front instead of
    an ambiguous-reference failure deep in the plan."""
    import pytest as _pytest

    from flink_project_spark.operators import asof as AS

    left = spark.createDataFrame([("k", 5)], "k string, ts long")
    right = spark.createDataFrame(
        [("k", 1, 9)], "k string, ts long, t long"
    )
    with _pytest.raises(ValueError, match="'t' collides"):
        AS.asof_join(left, right, on=["k"], left_time="ts", right_time="ts")


def test_asof_null_equality_keys_never_match(spark):
    """NULL never equals NULL in a join: a NULL-key right row matches
    nothing, and a NULL-key LEFT row comes back unmatched (left-join
    semantics) — Window.partitionBy would otherwise silently pair them,
    diverging from the streaming interval-join twin and any SQL oracle.
    Both the plain and bucketed forms agree."""
    from flink_project_spark.operators import asof as AS

    left = spark.createDataFrame(
        [(None, 10), ("k", 10)], "k string, ts long"
    )
    right = spark.createDataFrame(
        [(None, 5, 101), ("k", 5, 202)], "k string, rt long, v long"
    )
    for kw in ({}, {"bucket_width": 4}):
        fn = AS.asof_join_bucketed if kw else AS.asof_join
        got = {
            r["k"]: (r["rt_matched"], r["v_matched"])
            for r in fn(
                left, right, on=["k"], left_time="ts", right_time="rt", **kw
            ).collect()
        }
        assert got["k"] == (5, 202)
        assert got[None] == (None, None), got


def test_asof_validates_suffix_collisions_and_bucket_width(spark):
    from flink_project_spark.operators import asof as AS

    left = spark.createDataFrame(
        [("k", 5, 1)], "k string, ts long, v_matched long"
    )
    right = spark.createDataFrame([("k", 1, 9)], "k string, rt long, v long")
    with pytest.raises(ValueError, match="collide with left columns"):
        AS.asof_join(left, right, on=["k"], left_time="ts", right_time="rt")
    clean_left = left.drop("v_matched")
    with pytest.raises(ValueError, match="bucket_width must be > 0"):
        AS.asof_join_bucketed(
            clean_left, right, on=["k"], left_time="ts", right_time="rt",
            bucket_width=0,
        )


def test_funnel_rejects_reserved_step_columns(spark):
    from flink_project_spark.operators.funnel import funnel_times

    ev = spark.createDataFrame(
        [(1, "view", 5, 9)], "user_id long, event_type string, ts long, t1 long"
    )
    with pytest.raises(ValueError, match="collide with the"):
        funnel_times(ev, ["view", "click"])
