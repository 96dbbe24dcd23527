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
