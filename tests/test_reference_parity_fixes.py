"""Reference-parity and robustness regressions caught by the round-3
operator review — each test pins a behavior that previously diverged
from the reference (or failed confusingly) while every oracle stayed
green:

- rising_value_warning: plateaus must NOT disarm the timer
  (MyProcess.scala clears only on a strict fall), and a fall arriving
  after the deadline reveals the warning instead of suppressing it
- streaming_exact_dedup's batch fallback picks a deterministic survivor
- uauc keeps zero-weight users at weight 0 and drops all-zero groups
  (AucCalcVersion5 carries `show` on every row; `showAll != 0` gate)
- asof_join rejects working-column collisions up front
- interval_join_stream suffixes colliding right payload names
- windowed_uv inflates the watermark only in exact mode
- tumbling_counts works on inputs without a `value` column
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _run_warns(spark, tmp_path, data, rise_ms=8000, sub="r"):
    import uuid

    from flink_project_spark.streaming import stateful as ST

    src = tmp_path / f"rise_{sub}"
    src.mkdir()
    schema = "id string, event_ms long, temperature double"
    spark.createDataFrame(data, schema).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
    warns = ST.rising_value_warning(
        stream, "id", "event_ms", "temperature", rise_ms
    )
    name = f"w{uuid.uuid4().hex[:10]}"
    q = (
        warns.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(
        (r.key, r.warn_ms, r.value, r.rise_started_ms)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    )


def test_rising_warning_plateau_keeps_timer_armed(spark, tmp_path):
    """Equal readings neither arm nor clear (scala:25-33): a rise
    followed by a plateau spanning the deadline still warns."""
    rows = _run_warns(
        spark,
        tmp_path,
        [
            ("c", 0, 60.0),
            ("c", 2000, 61.0),   # arms at 2000, deadline 10000
            ("c", 6000, 61.0),   # plateau: timer stays armed
            ("c", 11000, 61.0),  # plateau past deadline -> warning fires
        ],
        sub="plateau",
    )
    assert rows == [("c", 11000, 61.0, 2000)]


def test_rising_warning_fires_before_late_fall_processes(spark, tmp_path):
    """Timers fire between elements: a fall arriving after the deadline
    reveals the warning first, then disarms."""
    rows = _run_warns(
        spark,
        tmp_path,
        [
            ("d", 0, 60.0),
            ("d", 1000, 61.0),   # arms at 1000, deadline 9000
            ("d", 12000, 59.0),  # fall past deadline: warn, THEN disarm
        ],
        sub="latefall",
    )
    assert rows == [("d", 12000, 59.0, 1000)]


def test_batch_dedup_survivor_is_deterministic(spark):
    import datetime as dt

    from flink_project_spark.streaming.dedup import streaming_exact_dedup

    base = dt.datetime(2026, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=s), "same content")
        for i, s in [(5, 9), (1, 3), (9, 3), (2, 7)]
    ]
    df = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    for layout in (df, df.repartition(7), df.repartition(1, "doc_id")):
        kept = streaming_exact_dedup(layout).collect()
        # earliest ts wins; the ts-tie (docs 1 and 9) breaks on doc_id
        assert [(r.doc_id,) for r in kept] == [(1,)]


def test_uauc_zero_weight_user_and_group(spark):
    from flink_project_spark.operators.auc import uauc

    rows = [
        # scene A, user u1: valid labels AND shows
        ("A", "u1", 0.9, 1, "show"),
        ("A", "u1", 0.1, 0, "show"),
        # scene A, user u2: valid labels, clicks only -> weight 0
        ("A", "u2", 0.8, 1, "click"),
        ("A", "u2", 0.2, 0, "click"),
        # scene B: valid labels but NO shows anywhere -> group dropped
        ("B", "u3", 0.7, 1, "click"),
        ("B", "u3", 0.3, 0, "click"),
    ]
    df = spark.createDataFrame(
        rows, "scene_id string, user_id string, score double, label int, action string"
    )
    out = {r.scene_id: r for r in uauc(df, ["scene_id"], weight_action="show").collect()}
    assert set(out) == {"A"}          # B's weights sum to 0 -> dropped
    assert out["A"].users == 2        # zero-weight u2 still counted
    assert out["A"].uauc == 1.0       # u2 contributes nothing to the mean


def test_asof_join_rejects_working_column_collision(spark):
    from flink_project_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 1, 0)], "k string, t long, _side int")
    right = spark.createDataFrame([("k", 1, 5)], "k string, rt long, v long")
    with pytest.raises(ValueError, match="_side"):
        asof_join(left, right, ["k"], "t", "rt")


def test_interval_join_suffixes_colliding_payloads(spark):
    import datetime as dt

    from flink_project_spark.streaming.joins import interval_join_stream

    base = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame(
        [("k", base, 1.0)], "k string, lts timestamp, score double"
    )
    right = spark.createDataFrame(
        [("k", base, 2.0)], "k string, rts timestamp, score double"
    )
    out = interval_join_stream(left, right, ["k"], "lts", "rts")
    assert out.columns == ["k", "lts", "score", "rts", "score_r"]
    r = out.collect()[0]
    assert r.score == 1.0 and r.score_r == 2.0


def test_windowed_uv_watermark_inflated_only_for_exact(spark):
    """Assert on STREAMING plans (the analyzer strips EventTimeWatermark
    from batch plans, which made an earlier batch-frame version of this
    test vacuously pass): approx mode must honor the caller's 10-minute
    bound; exact mode must inflate to the 1-day window."""
    from flink_project_spark.streaming.windows import windowed_uv

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .selectExpr(
            "timestamp AS ts", "'e' AS event_type", "value AS user_id"
        )
    )
    ap = (
        windowed_uv(stream, "ts", "1 day", ["event_type"], exact=False)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    ep = (
        windowed_uv(stream, "ts", "1 day", ["event_type"], exact=True)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "EventTimeWatermark" in ap and "EventTimeWatermark" in ep
    assert "10 minutes" in ap and "1 days" not in ap, ap
    assert "1 days" in ep, ep


def test_tumbling_counts_without_value_column(spark):
    import datetime as dt

    from flink_project_spark.operators.windows import tumbling_counts

    df = spark.createDataFrame(
        [(dt.datetime(2026, 1, 1, 0, 0, s), "a") for s in range(5)],
        "ts timestamp, id string",
    )
    out = tumbling_counts(df, "ts", "10 seconds", ["id"], value_col=None)
    assert out.columns == ["window_start", "id", "cnt"]
    assert out.collect()[0].cnt == 5


def test_count_with_timeout_accumulates_across_timeouts(spark, tmp_path):
    """CountWithTimeoutFunction.java onTimer only emits — it never
    clears the count — so a key's second silence reports the TOTAL
    count, not the count since the last timeout."""
    import time
    import uuid

    from flink_project_spark.streaming import stateful as ST

    src = tmp_path / "timeout_acc"
    src.mkdir()
    schema = "id string, event_ms long"
    spark.createDataFrame([("k1", 100), ("k1", 200)], schema).coalesce(
        1
    ).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
    counted = ST.count_with_timeout(stream, "id", timeout_ms=300)
    name = f"acc{uuid.uuid4().hex[:10]}"
    q = (
        counted.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql(f"SELECT * FROM {name}").count() >= 1:
                break
            time.sleep(0.5)
        first = [r.cnt for r in spark.sql(f"SELECT * FROM {name}").collect()]
        assert first and first[0] == 2
        # second wave for the same key, then a second silence
        spark.createDataFrame([("k1", 300)], schema).coalesce(1).write.parquet(
            str(src / "b2")
        )
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = [
                r.cnt for r in spark.sql(f"SELECT * FROM {name}").collect()
            ]
            if len(rows) >= 2:
                break
            time.sleep(0.5)
        assert 3 in rows, rows  # 2 + 1, NOT 1
    finally:
        q.stop()


def test_rising_warning_random_sweep_vs_reference_twin(spark, tmp_path):
    """Seeded sweep (x3): the vectorized event-jump scan equals a
    direct per-element simulation of MyProcess.scala's timer protocol
    (fire-check before the element's own arm/clear effect; arm on rise
    when unarmed; clear on strict fall or first reading; plateau is a
    no-op; the firing element can immediately re-arm)."""
    import random

    def twin(seq, rise_ms):
        out = []
        last, armed = None, -1
        for ts, val in seq:
            if armed >= 0 and ts >= armed + rise_ms:
                out.append((ts, val, armed))
                armed = -1
            if last is None or val < last:
                armed = -1
            elif val > last and armed < 0:
                armed = ts
            last = val
        return out

    for seed in (3, 17, 88):
        rnd = random.Random(seed)
        data = []
        expected = []
        for k in range(4):
            key = f"s{seed}k{k}"
            t = 0
            seq = []
            for _ in range(60):
                t += rnd.randrange(500, 4000)
                # plateaus deliberately common (0 delta w.p. ~1/3)
                seq.append((t, 60.0 + rnd.choice([0, 0, 1, 2, -1, -2]) * rnd.randrange(0, 3)))
            # make values a random walk with repeats
            vals, v = [], 60.0
            for _ in seq:
                v += rnd.choice([0.0, 0.0, 1.0, 2.0, -1.0, -3.0])
                vals.append(v)
            seq = [(ts, val) for (ts, _), val in zip(seq, vals)]
            data += [(key, ts, val) for ts, val in seq]
            expected += [
                (key, ts, val, armed) for ts, val, armed in twin(seq, 6000)
            ]
        rows = _run_warns(spark, tmp_path, data, rise_ms=6000, sub=f"swp{seed}")
        assert rows == sorted(expected), seed


def test_read_partitioned_text_globs_still_expand(spark, tmp_path):
    """The existence probe is globStatus, not exists: a glob path that
    matches dirs must keep working (a literal-exists check silently
    dropped it)."""
    from flink_project_spark.sources.readers import read_partitioned_text

    d = tmp_path / "day=20240101"
    d.mkdir()
    (d / "f.txt").write_text("d1\n")
    got = [
        r.value
        for r in read_partitioned_text(
            spark, [str(tmp_path / "day=2024010*"), str(tmp_path / "day=299*")]
        ).collect()
    ]
    assert got == ["d1"]


def test_bucketed_asof_rejects_working_column_collision(spark):
    from flink_project_spark.operators.asof import asof_join_bucketed

    left = spark.createDataFrame([("k", 1, 0)], "k string, t long, _b int")
    right = spark.createDataFrame([("k", 1, 5)], "k string, rt long, v long")
    with pytest.raises(ValueError, match="_b"):
        asof_join_bucketed(left, right, ["k"], "t", "rt", bucket_width=10)


def test_interval_join_raises_when_suffix_still_collides(spark):
    import datetime as dt

    from flink_project_spark.streaming.joins import interval_join_stream

    base = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame(
        [("k", base, 1.0, 9.0)],
        "k string, lts timestamp, score double, score_r double",
    )
    right = spark.createDataFrame(
        [("k", base, 2.0)], "k string, rts timestamp, score double"
    )
    with pytest.raises(ValueError, match="score_r"):
        interval_join_stream(left, right, ["k"], "lts", "rts")


def test_batch_dedup_tolerates_map_columns(spark):
    import datetime as dt

    from flink_project_spark.streaming.dedup import streaming_exact_dedup

    base = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [(1, base, "x", {"a": "b"}), (2, base, "x", {"c": "d"})],
        "doc_id long, ts timestamp, text string, meta map<string,string>",
    )
    kept = streaming_exact_dedup(df).collect()
    assert len(kept) == 1 and kept[0].doc_id == 1


def test_scalar_parsers_drop_bad_rows_under_ansi(spark):
    """json_get_int and sci_notation_to_long keep their documented
    drop-malformed/null-and-filter contracts under ANSI mode (Spark 4's
    default): corrupt values yield NULL (or Java-style saturation for
    out-of-range doubles), never a thrown cast error."""
    import flink_project_spark.functions.scalars as SC

    js = spark.createDataFrame(
        [('{"a":"xyz"}',), ('{"a":"7"}',), ('{"a":1.5}',), ("not json",)],
        "s string",
    )
    got = [r.v for r in js.select(SC.json_get_int("s", "a").alias("v")).collect()]
    assert got == [None, 7, None, None]

    sci = spark.createDataFrame(
        [("1.5673E9",), ("2.0E300",), ("-3e300",), ("bogus",), ("NaN",)],
        "s string",
    )
    got2 = [
        r.v for r in sci.select(SC.sci_notation_to_long("s").alias("v")).collect()
    ]
    # Java (long) narrowing: saturate at Long.MIN/MAX, NaN -> 0
    assert got2 == [
        1567300000, 9223372036854775807, -9223372036854775808, None, 0
    ]
