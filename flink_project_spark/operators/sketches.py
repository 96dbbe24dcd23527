"""Mergeable distinct-count sketches — the 100 TB UV pre-aggregation
pattern (SURVEY §2.5 A4 / §2.8 T8 at cluster scale).

`scene_uv` / the streaming UV path count exact distincts; at 100 TB
the winning layout is: sketch ONCE per storage partition (day, hour,
source shard) into a few-KB binary, persist the sketches next to the
data, and answer any rollup (per-week, per-month, all-time, any
dimension subset) by UNIONING sketches — no re-scan of the raw data,
no shuffle of user ids. Spark 3.5+ ships Apache DataSketches HLL for
exactly this (`hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate` — public API, SPARK-16484 family).

The sketch union is lossless w.r.t. the sketch state: estimating the
union of per-day sketches equals estimating one sketch built over the
whole table (pinned by test), so the rollup layer can be trusted to
arbitrary re-aggregation depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def uv_sketches(
    df: DataFrame,
    part_cols: list[str],
    id_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per `part_cols` group over `id_col`.

    Output: part_cols + `uv_sketch` (binary, ~2^lg_k bytes max) +
    `uv_estimate` (double-backed bigint estimate for direct reads).
    This is the "write side": run it per ingest partition and persist.
    """
    # single aggregation, estimate derived FROM the sketch column —
    # stating two hll_sketch_agg calls would hinge the one-pass plan on
    # Catalyst's semantic-equality dedup instead of saying it directly
    return df.groupBy(*part_cols).agg(
        F.hll_sketch_agg(id_col, F.lit(lg_k)).alias("uv_sketch")
    ).withColumn("uv_estimate", F.hll_sketch_estimate("uv_sketch"))


def uv_rollup(
    sketches: DataFrame,
    rollup_cols: list[str],
    sketch_col: str = "uv_sketch",
) -> DataFrame:
    """Re-aggregate persisted sketches to a coarser grain by union —
    bytes shuffled = (#groups x sketch size), never the id stream.

    Output: rollup_cols + `uv_sketch` (the merged sketch — kept so
    rollups CHAIN: a month grain unions 4-5 persisted week sketches
    instead of re-unioning every daily one) + `uv_estimate`.
    """
    grouped = (
        sketches.groupBy(*rollup_cols)
        if rollup_cols
        else sketches.groupBy()
    )
    return grouped.agg(
        F.hll_union_agg(sketch_col, F.lit(True)).alias("uv_sketch")
    ).withColumn("uv_estimate", F.hll_sketch_estimate("uv_sketch"))
