"""Source readers (S1-S4, S9 incl. Snappy-compressed text) and the
two-input co-processing operators (J9 coGroup, O6 connect/coMap).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_project_spark.operators import cogroup as CG
from flink_project_spark.sources import readers as RD


def test_read_text_and_snappy(spark, tmp_path):
    """S1 + S3: plain and snappy-compressed text through ONE reader."""
    plain = str(tmp_path / "plain")
    snappy = str(tmp_path / "snappy")
    df = spark.createDataFrame([("alpha",), ("beta",), ("gamma",)], "value string")
    df.coalesce(1).write.text(plain)
    df.coalesce(1).write.option("compression", "snappy").text(snappy)
    assert any(f.endswith(".snappy") for f in os.listdir(snappy)), os.listdir(snappy)
    got_plain = sorted(r.value for r in RD.read_text(spark, plain).collect())
    got_snappy = sorted(r.value for r in RD.read_text(spark, snappy).collect())
    assert got_plain == got_snappy == ["alpha", "beta", "gamma"]


def test_read_text_recursive(spark, tmp_path):
    """S2: nested directories enumerate recursively."""
    root = tmp_path / "root"
    for sub in ("a", "a/deep", "b"):
        d = root / sub
        d.mkdir(parents=True, exist_ok=True)
        (d / "part.txt").write_text(f"line-{sub}\n")
    got = sorted(
        r.value for r in RD.read_text_recursive(spark, str(root)).collect()
    )
    assert got == ["line-a", "line-a/deep", "line-b"]


def test_read_partitioned_text_skips_missing(spark, tmp_path):
    """S4: path-list scan tolerates missing partitions (the reference's
    fs.exists loop, ItemIdCfVersion5.java:87-110, collapses to this)."""
    p1 = tmp_path / "day=20240101"
    p1.mkdir()
    (p1 / "f.txt").write_text("d1\n")
    p3 = tmp_path / "day=20240103"
    p3.mkdir()
    (p3 / "f.txt").write_text("d3\n")
    # day=20240102 genuinely does NOT exist — the operator itself must
    # skip it (the old form of this test pre-filtered with os.path.exists,
    # so the "skips missing" claim was never exercised and the raw path
    # list raised PATH_NOT_FOUND)
    paths = [str(tmp_path / f"day=2024010{d}") for d in (1, 2, 3)]
    got = sorted(
        r.value for r in RD.read_partitioned_text(spark, paths).collect()
    )
    assert got == ["d1", "d3"]
    # every path missing -> empty frame with the text schema, not an error
    none = RD.read_partitioned_text(spark, [str(tmp_path / "day=29990101")])
    assert none.columns == ["value"] and none.count() == 0


def test_read_csv_custom_delimiter(spark, tmp_path):
    """S9: explicit schema + '/' delimiter (CsvTableSource parity)."""
    p = tmp_path / "c.csv"
    p.write_text("s1/u1/3\ns2/u2/5\n")
    schema = T.StructType(
        [
            T.StructField("scene", T.StringType()),
            T.StructField("user", T.StringType()),
            T.StructField("cnt", T.IntegerType()),
        ]
    )
    got = RD.read_csv(spark, str(p), schema, sep="/").collect()
    assert {(r.scene, r.user, r.cnt) for r in got} == {
        ("s1", "u1", 3),
        ("s2", "u2", 5),
    }


def test_cogroup_counts_full_outer_semantics(spark):
    """J9 relational form: keys missing from one side count 0."""
    left = spark.createDataFrame(
        [("s1", "a"), ("s1", "a"), ("s1", "b")], "scene string, item string"
    )
    right = spark.createDataFrame(
        [("s1", "a"), ("s1", "c")], "scene string, item string"
    )
    got = {
        (r.scene, r.item): (r.left_cnt, r.right_cnt)
        for r in CG.cogroup_counts(left, right, ["scene", "item"]).collect()
    }
    assert got == {
        ("s1", "a"): (2, 1),
        ("s1", "b"): (1, 0),
        ("s1", "c"): (0, 1),
    }


def test_cogroup_apply_matches_relational_form(spark):
    """J9 general form (applyInPandas) agrees with the Catalyst form."""
    left = spark.createDataFrame(
        [("s1", "a"), ("s1", "a"), ("s2", "b")], "scene string, item string"
    )
    right = spark.createDataFrame(
        [("s1", "a"), ("s3", "z")], "scene string, item string"
    )

    def fn(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        key = lg[["scene", "item"]] if len(lg) else rg[["scene", "item"]]
        return pd.DataFrame(
            {
                "scene": [key.iloc[0]["scene"]],
                "item": [key.iloc[0]["item"]],
                "left_cnt": [len(lg)],
                "right_cnt": [len(rg)],
            }
        )

    schema = "scene string, item string, left_cnt long, right_cnt long"
    got = {
        (r.scene, r.item): (r.left_cnt, r.right_cnt)
        for r in CG.cogroup_apply(left, right, ["scene", "item"], fn, schema).collect()
    }
    expected = {
        (r.scene, r.item): (r.left_cnt, r.right_cnt)
        for r in CG.cogroup_counts(left, right, ["scene", "item"]).collect()
    }
    assert got == expected and ("s3", "z") in got


def test_connect_comap_normalizes_heterogeneous_inputs(spark):
    """O6: two shapes mapped to one schema, merged without shuffle."""
    temps = spark.createDataFrame(
        [("t1", 21.5), ("t2", 30.0)], "sensor string, temp double"
    )
    alerts = spark.createDataFrame(
        [("a1", "overheat")], "source string, kind string"
    )
    merged = CG.connect_comap(
        temps,
        alerts,
        [F.col("sensor").alias("id"), F.lit("reading").alias("kind"),
         F.col("temp").alias("value")],
        [F.col("source").alias("id"), F.col("kind"),
         F.lit(None).cast("double").alias("value")],
    )
    rows = {(r.id, r.kind, r.value) for r in merged.collect()}
    assert rows == {
        ("t1", "reading", 21.5),
        ("t2", "reading", 30.0),
        ("a1", "overheat", None),
    }


def test_salted_topk_equals_plain_topk(spark):
    """Skew-proof two-phase top-K == single-window top-K for a total
    order, including a deliberately hot key."""
    import random

    from flink_project_spark.operators import setops as S

    rng = random.Random(11)
    rows = [("hot", rng.random(), i) for i in range(5000)] + [
        (f"g{i % 7}", rng.random(), 10_000 + i) for i in range(700)
    ]
    df = spark.createDataFrame(rows, "g string, score double, rid long")
    plain = {
        (r.g, r.rid)
        for r in S.top_k_per_group(
            df, ["g"], [F.col("score").desc(), F.col("rid")], 25
        ).collect()
    }
    salted = {
        (r.g, r.rid)
        for r in S.top_k_per_group_salted(
            df, ["g"], ["score", "rid"], 25, ascending=False
        ).collect()
    }
    assert salted == plain and len({g for g, _ in plain}) == 8


def test_read_jsonl_schema_and_corrupt_modes(spark, tmp_path):
    """JSONL ingest: explicit schema projects only the named fields,
    DROPMALFORMED drops corrupt lines, PERMISSIVE retains them in
    _corrupt_record, and .gz decompresses through the codec chain."""
    import gzip

    from pyspark.sql import types as T

    from flink_project_spark.sources.readers import read_jsonl

    lines = [
        '{"doc_id": 1, "text": "alpha", "extra": {"deep": [1,2,3]}}',
        '{"doc_id": 2, "text": "beta"}',
        "{corrupt json line",
        '{"doc_id": 4, "text": "gamma"}',
    ]
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines))
    gz = tmp_path / "corpus2.jsonl.gz"
    with gzip.open(gz, "wt") as f:
        f.write('{"doc_id": 9, "text": "zipped"}\n')

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    got = read_jsonl(spark, str(p), schema).collect()
    assert {(r["doc_id"], r["text"]) for r in got} == {
        (1, "alpha"),
        (2, "beta"),
        (4, "gamma"),
    }
    # PERMISSIVE + _corrupt_record quarantines the bad line
    qschema = schema.add(T.StructField("_corrupt_record", T.StringType()))
    perm = read_jsonl(spark, str(p), qschema, mode="PERMISSIVE")
    bad = perm.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1 and "corrupt" in bad[0]["_corrupt_record"]
    # gz through the codec chain
    z = read_jsonl(spark, str(gz), schema).collect()
    assert [(r["doc_id"], r["text"]) for r in z] == [(9, "zipped")]


def test_cogroup_counts_null_keys_pair_up(spark):
    """A NULL key groups as ONE key on both sides (matching the pandas
    cogroup twin) — a plain equality join would emit two half-rows."""
    from flink_project_spark.operators.cogroup import cogroup_counts

    left = spark.createDataFrame(
        [(None, 1), (None, 2), (None, 3), ("k", 1)], "g string, v int"
    )
    right = spark.createDataFrame(
        [(None, 9), (None, 8), ("k", 9), ("only_r", 1)], "g string, v int"
    )
    got = {
        r.g: (r.left_cnt, r.right_cnt)
        for r in cogroup_counts(left, right, ["g"]).collect()
    }
    assert got == {None: (3, 2), "k": (1, 1), "only_r": (0, 1)}
