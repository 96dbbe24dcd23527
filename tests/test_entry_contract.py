"""Driver-contract tests: entry() smoke, queries() vs oracle_sql() parity
at sf0.01 — the same comparison CORRECTNESS_r{N}.json records.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from tests.conftest import SF_CORRECT, assert_frames_match

QUERY_NAMES = sorted(E.queries().keys())


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None


def test_every_query_has_oracle_or_is_flagged():
    q = set(E.queries())
    o = set(E.oracle_sql())
    missing = q - o
    # non-SQL-expressible ops may be omitted; keep the list explicit
    assert missing <= {
        "emb_kmeans_cells",
        # GK sketch is engine-specific; rank-bound-checked in
        # test_length_profile_approx_within_rank_bound
        "doc_length_profile_approx",
        # iterative PQ codebook training; ADC exactness + recall
        # pinned in tests/test_llm.py (test_pq_*)
        "emb_ivfpq_topk",
    }, f"queries without oracle: {missing}"


def test_driver_cap_rotation_invariants():
    """The driver's CORRECTNESS check caps at the first ~50 entries of
    queries(): the rotation list must resolve completely, stay unique,
    and every in-cap entry must carry a SQL oracle (a rows-only entry
    would waste a cap slot on a weaker check)."""
    names = list(E.queries())
    assert len(names) == len(set(names))
    cap = names[:50]
    assert cap == E._DRIVER_CAP_ROTATION
    oracles = set(E.oracle_sql())
    assert all(n in oracles for n in cap)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    oracles = E.oracle_sql()
    if name not in oracles:
        pytest.skip(f"{name}: rows-only check (no SQL oracle)")
    sdf = E.queries()[name](spark, SF_CORRECT)
    ddf = duck.execute(oracles[name]).fetchdf()
    assert_frames_match(sdf, ddf)
