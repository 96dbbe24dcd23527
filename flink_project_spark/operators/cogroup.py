"""Two-input grouped co-processing — J9 (coGroup) and O6 (connect/coMap).

Ref: flink-itemcf huaban/ShuJuStatSecond.java:68-73 registers a
CoGroupFunction over two keyed DataSets; flink-base
SplitSelectStream.scala:29-33 connects two heterogeneous streams and
coMaps them to a common type.

Spark-first stance: a coGroup whose body is relational (count/sum/join
the two sides) should be a full-outer join of two aggregates — that
keeps it in Catalyst (map-side partial aggs, AQE-sized exchanges).
`cogroup_apply` is the general escape hatch for genuinely imperative
per-key co-processing: both groups arrive as Arrow-backed pandas frames.
At 100 TB both forms shuffle each input once on the key — identical
exchange placement to Flink's coGroup.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cogroup_apply(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    fn: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """J9: general coGroup — `fn(left_group, right_group) -> pdf` per key.

    Arrow-vectorized (`applyInPandas` over a cogrouped relation); each
    side is shuffled once on `keys`, groups stream through Python in
    batches. Prefer `cogroup_counts`/joins when the body is relational.
    """
    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(fn, schema)
    )


def cogroup_counts(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_name: str = "left_cnt",
    right_name: str = "right_cnt",
) -> DataFrame:
    """Relational coGroup: per-key row counts of both inputs, full outer.

    The Catalyst-native form of the reference's counting CoGroupFunction
    (ShuJuStatSecond.java:68-73): two partial-aggregated counts and one
    full-outer join — no Python, no per-key state, keys missing from a
    side count 0.

    The join is NULL-SAFE (eqNullSafe + key coalesce): groupBy puts all
    NULL-key rows of a side into ONE group, and `cogroup_apply`'s
    pandas cogroup pairs the two sides' NULL groups together — a plain
    equality join would emit two half-rows for a NULL key and the two
    coGroup forms would disagree (the equivalence the test pins).
    """
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).alias(left_name))
    rc = right.groupBy(*keys).agg(F.count(F.lit(1)).alias(right_name))
    cond = None
    for k in keys:
        c = lc[k].eqNullSafe(rc[k])
        cond = c if cond is None else cond & c
    return lc.join(rc, cond, "full_outer").select(
        *[F.coalesce(lc[k], rc[k]).alias(k) for k in keys],
        F.coalesce(F.col(left_name), F.lit(0)).alias(left_name),
        F.coalesce(F.col(right_name), F.lit(0)).alias(right_name),
    )


def connect_comap(
    left: DataFrame,
    right: DataFrame,
    left_select: list,
    right_select: list,
) -> DataFrame:
    """O6: connect + coMap — map two heterogeneous inputs to one shape
    and merge.

    Ref: SplitSelectStream.scala:29-33 (ConnectedStreams.map(f1, f2)).
    Each `*_select` list projects its input to the SAME column names and
    types; the merge is a zero-shuffle unionByName. Works for batch and
    streaming frames alike.
    """
    return left.select(*left_select).unionByName(right.select(*right_select))
