"""Set operations, stream demux analogs, top-k, histograms — SURVEY §2.7.

Ref patterns: union (OfflineJob.java:128,493-495), minus/EXCEPT
(flink-itemcf validate/CheckValues.java:54), split/select + side outputs
(flink-base SplitSelectStream.scala:14-33, FreezingAlert.scala:15-28),
top-K truncation + min-length filters (flink-process
Hdfs2RedisVersion5.java:84-92), bucketed histograms
(PetalDataSetUtils.java:293-331).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_all(*dfs: DataFrame) -> DataFrame:
    """O3: multi-input union by name (bag semantics, no dedup shuffle)."""
    if not dfs:
        raise ValueError(
            "union_all needs at least one frame (a splatted discovery "
            "list came back empty)"
        )
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def minus(left: DataFrame, right: DataFrame) -> DataFrame:
    """O4: set-semantics EXCEPT (the reference Table.minus is set-based).

    Ref: CheckValues.java:54 — published_values MINUS censored_whitelist;
    empty result = invariant holds. Catalyst plans this as a left-anti
    join after dedup; at scale the right side should be the small one
    (broadcast), which matches the validation use case.
    """
    return left.subtract(right)


def split_by_predicate(df: DataFrame, predicate, tag_col: str = "split") -> DataFrame:
    """O5/O7: split/select + side-output analog — tag rows instead of
    physically demuxing; downstream sinks filter on the tag.

    Ref: SplitSelectStream.scala:14-22 (split by threshold into 'high'/
    'low'), FreezingAlert.scala:15-28 (main vs alert side output). One
    scan, no duplicated pipeline.
    """
    return df.withColumn(
        tag_col, F.when(predicate, F.lit("high")).otherwise(F.lit("low"))
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
) -> DataFrame:
    """Top-K rows per group via row_number (deterministic given a total
    order). Ref: neighbor-list truncation at 400
    (Hdfs2RedisVersion5.java:84-92) in row form.
    """
    from pyspark.sql import Window

    if "rn" in df.columns:
        # withColumn would silently OVERWRITE the caller's data and the
        # trailing drop would remove the column entirely
        raise ValueError(
            "input column 'rn' collides with the operator's working "
            "rank column; rename it first"
        )
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def top_k_per_group_salted(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    k: int,
    ascending: bool = True,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof top-K: two-phase partial/final truncation.

    `top_k_per_group`'s window sorts each group on ONE task — a hot key
    with 10^8 rows serializes the job at 100 TB. This variant salts each
    row into `salt_buckets` sub-groups, takes a partial top-K per
    (group, salt) — map-side-bounded at k rows per sub-group — then a
    final top-K over the <= k*salt_buckets survivors. Identical result
    for any total order (the global top-K is contained in the union of
    partial top-Ks); the heavy sort never sees more than max(|group| /
    salt_buckets, k * salt_buckets) rows on one task.

    The salt mixes the input partition id into the hash: a hash of the
    order columns ALONE collapses when a hot group's order values are
    low-cardinality (ties all land in one bucket — exactly the
    serialization this operator exists to prevent), while the partition
    id spreads identical rows across buckets because a hot group's rows
    span many input partitions. The RESULT is assignment-independent —
    the global top-K is contained in the union of partial top-Ks for
    ANY row-to-bucket assignment — so an AQE re-plan changing partition
    ids cannot change the answer, only the spread.
    """
    from pyspark.sql import Window

    order = [
        F.col(c).asc() if ascending else F.col(c).desc() for c in order_cols
    ]
    salt = F.pmod(
        F.xxhash64(F.spark_partition_id(), *[F.col(c) for c in order_cols]),
        salt_buckets,
    )
    clashes = {"_salt", "_prn", "_rn"} & set(df.columns)
    if clashes:
        raise ValueError(
            f"input column(s) {sorted(clashes)} collide with the salted "
            "operator's working columns; rename them first"
        )
    partial_w = Window.partitionBy(*group_cols, "_salt").orderBy(*order)
    final_w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_prn", F.row_number().over(partial_w))
        .filter(F.col("_prn") <= k)
        .withColumn("_rn", F.row_number().over(final_w))
        .filter(F.col("_rn") <= k)
        .drop("_salt", "_prn", "_rn")
    )


def bucket_histogram(
    df: DataFrame, value_col: str, buckets: list[int]
) -> DataFrame:
    """A14: bucketize a numeric column into ">=b" ranges and count.

    Ref: ItemIdCfVersion5.java:242-278 / PetalDataSetUtils.java:293-331 —
    the 'quDuan' neighbor-list-size histogram ("400+", "300+", ...). The
    when/otherwise chain stays in codegen; a single narrow shuffle of
    (bucket, 1) pairs. The fall-through label is "0+": values below the
    smallest bucket (including negatives) land there — pass an explicit
    low bound if negatives need their own bucket.
    """
    if not buckets:
        raise ValueError("buckets must be non-empty")
    buckets = sorted(buckets, reverse=True)
    expr = F.when(F.col(value_col) >= buckets[0], F.lit(f"{buckets[0]}+"))
    for b in buckets[1:]:
        expr = expr.when(F.col(value_col) >= b, F.lit(f"{b}+"))
    expr = expr.otherwise(F.lit("0+"))
    return (
        df.select(expr.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
