"""Dashboard quality metrics — flink-statistics parity.

The reference module computes recommendation-dashboard health metrics as
batch Table-API jobs (flink-statistics/src/main/java/com/wufuqiang/
statistics/...). Each function here is the Spark-first re-expression:
declarative DataFrame algebra, no hand-scheduled shuffles — Catalyst
plans partial aggregation, broadcast joins and pushdown.

Scale notes (100 TB): every aggregation below is keyed by scene/action
(cardinality ~tens) after a map-side partial agg, so the shuffle volume
is rows-per-distinct-key, not input size. The UV computations are the
only heavy shuffles (distinct over (scene,user)); at 100 TB you'd switch
`exact=False` to use HyperLogLog (approx_count_distinct) — both modes
are exposed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The reference substitutes this sentinel for missing JSON fields
# (OfflineJob.java:166,178-182); we keep real nulls internally and expose
# the sentinel only where output parity requires it.
INVALID_SENTINEL = "RECOMDASHBOARDINVALID"

# Max-double stands in for "infinite CTR" when shows=0 but clicks>0
# (OfflineDataSetUtils.java:271-310 divide-by-zero sentinel).
MAX_DOUBLE = 1.7976931348623157e308


def filter_valid_actions(action_log: DataFrame) -> DataFrame:
    """Parse-gate: keep rows with context_exist='1' and non-blank ids.

    Ref: OfflineDataSetUtils.java:89-94 (contextExist gate),
    ActionLogJobSecond.java:92-103 (blank-id drops). Runs before any
    join/agg so Catalyst pushes it into the scan. "Blank" follows the
    reference's isNotBlank for SPACE-padded ids (trim() removes spaces
    in both Spark and DuckDB — the cross-engine-identical subset of
    Java's Character.isWhitespace; exotic whitespace ids still pass).
    """
    return action_log.filter(
        (F.col("context_exist") == "1")
        & (F.trim(F.col("user_id")) != "")
        & (F.trim(F.col("item_id")) != "")
    )


def scene_uv(action_log: DataFrame, exact: bool = True) -> DataFrame:
    """A4: per-scene unique visitors.

    Ref: OfflineJob.java:267-279 / OfflineJobVersion2.java:46-51 — the
    reference does distinct-(scene,user) then count per scene; Spark's
    count-distinct plans the identical two-phase expand/agg. The
    approximate mode is the 100 TB path (HLL, no exact distinct shuffle).
    """
    agg = (
        F.countDistinct("user_id") if exact else F.approx_count_distinct("user_id")
    )
    return action_log.groupBy("scene_id").agg(agg.alias("uv"))


def action_counts(action_log: DataFrame) -> DataFrame:
    """A2: event counts per (scene, action).

    Ref: OfflineJobVersion2.java:54-56, ShuJuStat.java:77-78.
    """
    return action_log.groupBy("scene_id", "action").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def scene_ctr(action_log: DataFrame) -> DataFrame:
    """A15: per-scene CTR with divide-by-zero sentinel.

    clicks/shows per scene; when shows=0 and clicks>0 the reference emits
    Double.MAX_VALUE (OfflineDataSetUtils.java:271-310). Conditional
    aggregation — one pass, no join of two sub-aggregates.
    """
    return (
        action_log.groupBy("scene_id")
        .agg(
            F.sum(F.when(F.col("action") == "show", 1).otherwise(0)).alias("shows"),
            F.sum(F.when(F.col("action") == "click", 1).otherwise(0)).alias("clicks"),
        )
        .select(
            "scene_id",
            "shows",
            "clicks",
            F.when(F.col("shows") > 0, F.col("clicks") / F.col("shows"))
            .when(F.col("clicks") > 0, F.lit(MAX_DOUBLE))
            .otherwise(F.lit(0.0))
            .alias("ctr"),
        )
    )


def user_ctr_abnormal_ratio(
    action_log: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """CTR-abnormal-user ratio per scene — OfflineJob.java:376-429 (J3+A15).

    A user is abnormal when (shows=0 AND clicks>0) OR clicks/shows >
    threshold. The reference computes show-counts and click-counts as two
    Table aggregations and full-outer-joins them (OfflineJob.java:386-387);
    here a single conditional aggregation avoids that join entirely — same
    result, one shuffle instead of three.
    """
    per_user = action_log.groupBy("scene_id", "user_id").agg(
        F.sum(F.when(F.col("action") == "show", 1).otherwise(0)).alias("shows"),
        F.sum(F.when(F.col("action") == "click", 1).otherwise(0)).alias("clicks"),
    )
    abnormal = (
        ((F.col("shows") == 0) & (F.col("clicks") > 0))
        | ((F.col("shows") > 0) & (F.col("clicks") / F.col("shows") > threshold))
    )
    return per_user.groupBy("scene_id").agg(
        F.count(F.lit(1)).alias("users"),
        F.sum(F.when(abnormal, 1).otherwise(0)).alias("abnormal_users"),
        (
            F.sum(F.when(abnormal, 1).otherwise(0)) / F.count(F.lit(1))
        ).alias("abnormal_ratio"),
    )


def show_click_full_outer(action_log: DataFrame) -> DataFrame:
    """J3/J4: full-outer join of show-counts and click-counts per (scene,item)
    with null-safe coalesce of the key from both sides.

    Ref: OfflineJob.java:386-387 (Table fullOuterJoin),
    AucCalcVersion5.java:491-514 (DataSet full outer + coalesce JoinFunction).
    Kept as an explicit two-aggregate join — this is the operator under
    test (the single-pass rewrite exists in user_ctr_abnormal_ratio).
    """
    shows = (
        action_log.filter(F.col("action") == "show")
        .groupBy("scene_id", "item_id")
        .agg(F.count(F.lit(1)).alias("shows"))
    )
    clicks = (
        action_log.filter(F.col("action") == "click")
        .groupBy("scene_id", "item_id")
        .agg(F.count(F.lit(1)).alias("clicks"))
    )
    j = shows.alias("s").join(
        clicks.alias("c"),
        on=[
            F.col("s.scene_id") == F.col("c.scene_id"),
            F.col("s.item_id") == F.col("c.item_id"),
        ],
        how="full_outer",
    )
    return j.select(
        F.coalesce(F.col("s.scene_id"), F.col("c.scene_id")).alias("scene_id"),
        F.coalesce(F.col("s.item_id"), F.col("c.item_id")).alias("item_id"),
        F.coalesce(F.col("s.shows"), F.lit(0)).alias("shows"),
        F.coalesce(F.col("c.clicks"), F.lit(0)).alias("clicks"),
    )


def transfer_error_ratio(action_log: DataFrame, recall_log: DataFrame) -> DataFrame:
    """J1+A4: per-scene ratio of action events whose (user,item) also
    appears in the recall log — "transfer error" = actions that the
    recommendation pipeline can't account for.

    Ref: OfflineDataSetUtils.java:169-207 (multi-key inner join between
    action and recall logs, then per-scene counts). The recall side is
    deduplicated before the join (it has multiplicity per candidate);
    Catalyst/AQE picks broadcast-hash when the dedup'd recall side is
    small, sort-merge otherwise.
    """
    recall_keys = recall_log.select("scene_id", "user_id", "item_id").distinct()
    total = action_log.groupBy("scene_id").agg(F.count(F.lit(1)).alias("total_actions"))
    matched = (
        action_log.join(recall_keys, on=["scene_id", "user_id", "item_id"], how="inner")
        .groupBy("scene_id")
        .agg(F.count(F.lit(1)).alias("matched_actions"))
    )
    return (
        total.join(matched, on="scene_id", how="left")
        .select(
            "scene_id",
            "total_actions",
            F.coalesce("matched_actions", F.lit(0)).alias("matched_actions"),
            (
                1.0
                - F.coalesce("matched_actions", F.lit(0)) / F.col("total_actions")
            ).alias("error_ratio"),
        )
    )


def user_fluctuation(action_log: DataFrame) -> DataFrame:
    """J5: per-(scene,action) UV joined against per-scene total UV (left),
    yielding each action's share of scene traffic.

    Ref: OfflineDataSetUtils.java:231-267 (metric left-join total UV).
    """
    per_action = action_log.groupBy("scene_id", "action").agg(
        F.countDistinct("user_id").alias("action_uv")
    )
    totals = action_log.groupBy("scene_id").agg(
        F.countDistinct("user_id").alias("total_uv")
    )
    return (
        per_action.join(totals, on="scene_id", how="left")
        .select(
            "scene_id",
            "action",
            "action_uv",
            "total_uv",
            (F.col("action_uv") / F.col("total_uv")).alias("uv_share"),
        )
    )


def metric_pivot(action_log: DataFrame) -> DataFrame:
    """A13: pivot per-(scene,action) counts into one row per scene with a
    single '_'-joined metrics column.

    Ref: OfflineDataSetUtils.java:389-418 / OfflineJob.java:499-523 — the
    reference reduceGroups 6 metric rows into a concatenated string; Spark
    expresses it as pivot + concat_ws. Pivot values are enumerated
    explicitly so the plan needs no extra pass to discover them.
    """
    actions = {
        "show": "cnt_show",
        "click": "cnt_click",
        "detailPageShow": "cnt_detail_page_show",
        "other": "cnt_other",
    }
    pivoted = (
        action_log.groupBy("scene_id")
        .pivot("action", list(actions))
        .agg(F.count(F.lit(1)))
    )
    filled = pivoted.select(
        "scene_id",
        *[F.coalesce(F.col(a), F.lit(0)).alias(alias) for a, alias in actions.items()],
    )
    return filled.select(
        "scene_id",
        *[F.col(alias) for alias in actions.values()],
        F.concat_ws(
            "_", *[F.col(alias).cast("string") for alias in actions.values()]
        ).alias("metrics_joined"),
    )


def sentinel_fill(df: DataFrame, cols: list[str]) -> DataFrame:
    """F5: reference-sentinel compatibility — replace nulls in the
    LISTED string columns with the reference's magic string
    (OfflineJob.java:166,178-182). Engine keeps nulls internally; apply
    this only at reference-format sinks. A listed column that is
    missing or non-string is an error, not a silent no-op.
    """
    types = dict(df.dtypes)
    bad = [c for c in cols if types.get(c) != "string"]
    if bad:
        raise ValueError(
            f"sentinel_fill columns {bad} are missing or non-string "
            f"(types: {({c: types.get(c) for c in bad})})"
        )
    target = set(cols)
    return df.select(
        *[
            F.coalesce(F.col(c), F.lit(INVALID_SENTINEL)).alias(c)
            if c in target
            else F.col(c)
            for c in df.columns
        ]
    )
