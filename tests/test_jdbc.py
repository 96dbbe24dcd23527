"""S8/K3 JDBC round-trip against embedded Derby (bundled with Spark —
no external DB needed): write_jdbc -> read_jdbc -> transform ->
write_jdbc(append) -> read back.

Ref: flink-process source/SourceFromMysql.java:12-85 (RichSourceFunction
running one SELECT) and sink/Sink2Mysql.java:36-58 (prepared-statement
insert). The reference needs 110 LoC of connection plumbing; the DSv2
JDBC source/sink subsumes it and adds predicate pushdown + partitioned
parallel reads.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_project_spark import fixtures as FX
from flink_project_spark.sinks.writers import write_jdbc
from flink_project_spark.sources.readers import read_jdbc
from tests.conftest import SF_SMOKE

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_write_read_roundtrip(spark, derby_url):
    va = (
        FX.fixture_df(spark, SF_SMOKE, "valid_actions")
        .select("scene_id", "user_id", "item_id", "action", "action_time")
        .limit(200)
    )
    write_jdbc(va, derby_url, "actions", mode="overwrite")

    back = read_jdbc(
        spark,
        derby_url,
        'SELECT "scene_id", "user_id", "item_id", "action", "action_time" FROM actions',
        {"driver": DRIVER},
    )
    assert back.count() == 200
    assert sorted(back.columns) == sorted(va.columns)
    # values survive the round trip exactly
    a = sorted(map(tuple, va.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_jdbc_transform_and_append(spark, derby_url):
    """read -> aggregate -> insert into a second table -> read back
    (the reference's SourceFromMysql -> job -> Sink2Mysql shape)."""
    src = read_jdbc(
        spark,
        derby_url,
        'SELECT "scene_id", "action" FROM actions',
        {"driver": DRIVER},
    )
    counts = src.groupBy("scene_id", "action").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    write_jdbc(counts, derby_url, "action_counts", mode="overwrite")
    write_jdbc(counts, derby_url, "action_counts", mode="append")

    back = read_jdbc(
        spark,
        derby_url,
        'SELECT "scene_id", "action", "cnt" FROM action_counts',
        {"driver": DRIVER},
    )
    # appended once -> every row exactly twice
    assert back.count() == 2 * counts.count()
    doubled = back.groupBy("scene_id", "action", "cnt").count()
    assert doubled.filter(F.col("count") != 2).count() == 0


def test_jdbc_predicate_pushdown(spark, derby_url):
    """dbtable-mode reads push filters into the JDBC scan (the
    'PushedFilters' contract a 100 TB source relies on)."""
    va = (
        FX.fixture_df(spark, SF_SMOKE, "valid_actions")
        .select("scene_id", "user_id", "item_id", "action")
        .limit(200)
    )
    # VARCHAR (not Derby's CLOB default) so pushed comparisons are legal
    write_jdbc(
        va,
        derby_url,
        "actions_v",
        mode="overwrite",
        column_types=(
            "scene_id VARCHAR(64), user_id VARCHAR(64), "
            "item_id VARCHAR(64), action VARCHAR(32)"
        ),
    )
    reader = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "actions_v")
        .option("driver", DRIVER)
    )
    df = reader.load().filter(F.col("action") == "show")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "action" in plan
    # pushed filter returns exactly what a Spark-side filter would
    expected = (
        reader.load().collect()
    )
    n_show = sum(1 for r in expected if r.action == "show")
    assert df.count() == n_show and n_show > 0
