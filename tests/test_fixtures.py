"""Fixture parity: the dual-dialect derivations must be bit-identical
between Spark and DuckDB — this is the foundation every oracle rests on.
"""

from __future__ import annotations

import pytest

from flink_project_spark import fixtures as FX
from tests.conftest import SF_CORRECT, assert_frames_match


@pytest.mark.parametrize("name", sorted(FX.FIXTURE_SQL.keys()))
def test_fixture_parity(spark, duck, name):
    sdf = FX.fixture_df(spark, SF_CORRECT, name)
    ddf = duck.execute(
        FX.fixture_cte(name) + f"SELECT * FROM {name}"
    ).fetchdf()
    assert_frames_match(sdf, ddf)


def test_url_query_param_escapes_regex_metachars(spark):
    from flink_project_spark.functions import scalars as SC
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("GET /p?user.id=7&userXid=42&q%5B0%5D=z HTTP/1.1",)], ["req"]
    )
    row = df.select(
        SC.url_query_param("req", "user.id").alias("dotted"),
        SC.url_query_param("req", "q%5B0%5D").alias("bracketed"),
    ).collect()[0]
    # '.' must match literally: userXid=42 is NOT a user.id match
    assert row.dotted == "7"
    assert row.bracketed == "z"
