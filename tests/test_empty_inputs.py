"""Empty-input robustness: every contract query must plan and execute
over ZERO-ROW tables without raising.

At 100 TB an empty slice is routine — a new day's partition before
ingest lands, a source filtered to nothing, a dedup stage that removed
everything. A query that throws on empty input (a .first() probe, an
argmin over zero candidates, a division that assumes rows) turns a
quiet no-op day into a pipeline page. The mirror preserves the EXACT
physical parquet schemas (pyarrow schema round-trip — the events table
carries TIMESTAMP(NANOS), which a Spark rewrite would silently
retype).
"""

from __future__ import annotations

import glob
import os

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_empty")
    for p in glob.glob(f"{SF_SMOKE}/*.parquet"):
        sch = pq.read_schema(p)
        pq.write_table(sch.empty_table(), str(d / os.path.basename(p)))
    return str(d)


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    import __spark_entry__ as E

    fails = {}
    for name, fn in E.queries().items():
        try:
            fn(spark, empty_sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — collecting the sweep
            fails[name] = f"{type(ex).__name__}: {str(ex)[:120]}"
    assert not fails, fails


def test_trainers_return_empty_models_and_assigns_noop(spark, empty_sf_dir):
    """The two iterative trainers: an empty corpus trains an empty
    model, and every assign/search path treats that as a typed no-op
    (same output schema, zero rows) instead of an AnalysisException."""
    from flink_project_spark.llm import similarity as SIM

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert SIM.kmeans_train(emb, k=4, iters=2) == []
    assert SIM.kmeans_assign(emb, []).count() == 0
    assert SIM.kmeans_assign_probes(emb, [], probes=2).count() == 0

    books = SIM.pq_train(emb, m=2, k=4, dim=4, iters=1)
    assert all(not b for b in books)
    enc = SIM.pq_assign(emb, books)
    assert enc.count() == 0 and "codes" in enc.columns
    out = SIM.pq_topk(emb, emb, books, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "adc_dist", "rank"]


@pytest.fixture(scope="module")
def nulls_sf_dir(tmp_path_factory):
    """sf0.001 plus a few rows with NULLed nullable fields (text, lang,
    source, embedding, event payload columns) — the shape real corpora
    have and the synthetic tables don't."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_nulls")
    nullcols = {
        "documents": ["text", "lang", "source"],
        "embeddings": ["embedding"],
        "events": ["event_type", "value", "props"],
    }
    for p in glob.glob(f"{SF_SMOKE}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        t = pq.read_table(p)
        if name in nullcols:
            extra = t.slice(0, 3).to_pylist()
            for i, r in enumerate(extra):
                for c in nullcols[name]:
                    r[c] = None
                for idc in ("doc_id", "vec_id", "event_id"):
                    if idc in r and r[idc] is not None:
                        r[idc] = 10_000_000 + i
            t = pa.concat_tables(
                [t, pa.Table.from_pylist(extra, schema=t.schema)]
            )
        pq.write_table(t, str(d / os.path.basename(p)))
    return str(d)


def test_every_query_survives_null_fields(spark, nulls_sf_dir):
    """NULL text/lang/source/embedding/event-payload rows must flow
    through every query (dropped, bucketed as null keys, or zero-stat
    rows — any consistent treatment) without raising."""
    import __spark_entry__ as E

    fails = {}
    for name, fn in E.queries().items():
        try:
            fn(spark, nulls_sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — collecting the sweep
            fails[name] = f"{type(ex).__name__}: {str(ex)[:120]}"
    assert not fails, fails
