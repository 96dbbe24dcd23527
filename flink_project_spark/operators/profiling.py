"""Distribution diagnostics that gate physical-strategy choices.

The engine ships two join/agg strategies in several places (plain vs
salted top-K, plain vs bucketed as-of join) and documents "engage the
salted form when a key is hot" — this module computes the evidence that
decision needs. The cluster workflow: profile the prospective key once,
read max_group / top1_share_pct, pick the strategy (and the salt bucket
count) from numbers instead of folklore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_project_spark.operators.windows import exact_rank_expr, global_rank


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """ONE-row skew profile of a prospective shuffle key.

    Reports exact group-size quantiles (rank-pick ceil(q*n) over the
    ascending group-size order, key tie-break — the same exact-discrete
    rule as `llm.text.length_profile`), the max group, and the share of
    all rows held by the heaviest key. A key with top1_share_pct in
    double digits is a salting candidate; p99 ~ p50 means plain hash
    partitioning is fine.

    Scale: one map-side-combined groupBy over the data, then ALL work
    runs on the per-key count table (|keys| rows, 2 narrow columns).
    The quantile ranks come from `global_rank` (range repartition +
    broadcast offsets), so even a billion-key profile never sorts on a
    single task. Output is a single row — safe to collect/broadcast
    into a planning step.
    """
    clashes = {"_cnt", "_rk", "_nk"} & set(df.columns)
    if clashes:
        raise ValueError(
            f"input column(s) {sorted(clashes)} collide with the "
            "profiler's working columns; rename them first"
        )
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_cnt"))
    ranked = global_rank(
        counts, [F.col("_cnt").asc(), F.col(key_col).asc()], rank_col="_rk"
    )
    # n_keys = max rank: ranks are a dense 1..N total order, so the
    # key count comes from the already-persisted rank table — a
    # separate counts.agg() would re-scan and re-aggregate the full
    # profiled input a second time
    scalar = F.broadcast(ranked.agg(F.max("_rk").alias("_nk")))
    names = ["n_keys", "n_rows", "max_group"]
    aggs = [
        F.max("_nk").cast("long").alias("n_keys"),
        F.sum("_cnt").cast("long").alias("n_rows"),
        F.max("_cnt").cast("long").alias("max_group"),
    ]
    for q in qs:
        # THE shared exact-discrete rank rule (same helper as
        # llm.text.length_profile)
        rank = exact_rank_expr(q, "_nk")
        name = f"p{int(round(q * 100))}_group"
        names.append(name)
        aggs.append(
            F.max(F.when(F.col("_rk") == rank, F.col("_cnt")))
            .cast("long")
            .alias(name)
        )
    # COALESCE to a zero profile on empty input: the crossJoin with the
    # 1-row scalar leaves zero rows, and the no-groupBy agg would emit
    # one all-NULL row — a planning step comparing top1_share_pct or
    # n_rows must read zeros, not NULLs (try_divide: 0-row n_rows is 0)
    zero = F.lit(0).cast("long")
    return (
        ranked.crossJoin(scalar)
        .agg(*aggs)
        .select(*[F.coalesce(F.col(c), zero).alias(c) for c in names])
        .withColumn(
            "top1_share_pct",
            F.coalesce(
                F.try_divide(
                    F.col("max_group").cast("double"),
                    F.col("n_rows").cast("double"),
                )
                * 100.0,
                F.lit(0.0),
            ),
        )
    )
