"""AUC / UAUC model-quality metrics — flink-auccalc parity (SURVEY §2.5
A8-A11, §2.6 W1-W2).

The reference computes Mann-Whitney AUC per (sceneId, channel) by
sorting each group by score, assigning tie-averaged ranks with a manual
group walk, then applying AUC = (Σrank⁺ − P(P+1)/2)/(P·N)
(AucCalcVersion5.java:302-429). Per-user AUC plus an impression-weighted
mean gives UAUC (AucCalcVersion5.java:343-392,432-489).

This implementation uses the algebraically-identical *integer* form so
results are exactly reproducible (and oracle-checkable bit-for-bit):
group rows by distinct score; with p_s/n_s the positive/negative counts
at score s and cneg(s) the negatives strictly below s,

    2·numerator = Σ_s p_s · (2·cneg(s) + n_s)
    AUC         = 2·numerator / (2·P·N)

— Σrank⁺ with tie-averaged ranks equals numerator + P(P+1)/2, all in
int64, with a single final double division. No floating-point
accumulation order sensitivity anywhere.

Scale notes: the heavy operation is the per-(keys, score) aggregation —
a single hash aggregate with map-side partials. The window cumulative
sum runs per key group over *distinct scores* (bounded by score
cardinality, not impressions). At 100 TB this is shuffle-light: the
exchange carries one row per (scene, channel, score).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stack_channels(df: DataFrame, channel_col: str = "channel") -> DataFrame:
    """Unpivot each impression into ('all', channel) rows.

    Ref: AucCalcVersion5.java:276-299 — the reference flatMaps every
    record into one row per reporting dimension so downstream AUC groups
    compute both the overall and per-channel metric in one pass.
    explode(array(...)) keeps it a narrow codegen'd op (no join, no
    second scan).
    """
    return df.withColumn(
        channel_col,
        F.explode(F.array(F.lit("all"), F.col(channel_col))),
    )


def _per_score_counts(df: DataFrame, keys: list[str], score: str, label: str):
    return df.groupBy(*keys, score).agg(
        F.sum(F.col(label)).alias("p_s"),
        F.sum(F.lit(1) - F.col(label)).alias("n_s"),
    )


def auc(
    df: DataFrame,
    keys: list[str],
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """A8-A10: Mann-Whitney AUC with exact tie handling per key group.

    Returns (keys..., positives, negatives, auc) with auc NULL when a
    group has no positives or no negatives (the reference's undefined
    branch, AucCalcVersion5.java:422-427).

    Rows with a NULL score are EXCLUDED up front: an unrankable row has
    no place in a rank statistic, and leaving it in would make the
    result engine-dependent (Spark windows sort NULLS FIRST, SQL
    oracles NULLS LAST — the cneg accumulation would diverge the moment
    a NULL score appears, e.g. from `effective_score` on a '-2'-model
    row with no recall_score). The oracles apply the identical filter.
    """
    per_score = _per_score_counts(
        df.filter(F.col(score_col).isNotNull()), keys, score_col, label_col
    )
    return auc_from_counts(per_score, keys, score_col)


def auc_from_counts(
    per_score: DataFrame,
    keys: list[str],
    score_col: str = "score",
) -> DataFrame:
    """The AUC tail over a PRE-AGGREGATED per-(keys, score) counts table
    with columns ``p_s``/``n_s`` (positives/negatives at that score).

    Split out so the AUC family can share ONE persisted counts
    intermediate (the per-(scene, channel, user, score) table serves
    both `auc` — counts re-summed to the coarser grain — and `uauc` —
    counts already at grain), instead of each query re-scanning and
    re-aggregating the impression log. Input must already exclude
    NULL-score rows (see `auc`)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(score_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_cneg = per_score.withColumn(
        "cneg", F.coalesce(F.sum("n_s").over(w), F.lit(0))
    )
    # the rank-sum term accumulates in decimal(38,0): p_s * (2*cneg +
    # n_s) is bounded by 2*P*N per group, which exceeds int64 once
    # P*N > 4.6e18 (about 1e9 positives x 5e9 negatives — reachable at
    # the 100 TB scale this module targets); a silent int64 wraparound
    # would emit a garbage AUC with no error under non-ANSI mode
    grouped = with_cneg.groupBy(*keys).agg(
        F.sum("p_s").alias("positives"),
        F.sum("n_s").alias("negatives"),
        F.sum(
            F.col("p_s").cast("decimal(20,0)")
            * (F.lit(2) * F.col("cneg") + F.col("n_s"))
        ).alias("num2"),
    )
    return grouped.select(
        *keys,
        "positives",
        "negatives",
        F.when(
            (F.col("positives") > 0) & (F.col("negatives") > 0),
            F.col("num2").cast("double")
            / (F.lit(2.0) * F.col("positives") * F.col("negatives")),
        ).alias("auc"),
    )


def uauc(
    df: DataFrame,
    keys: list[str],
    user_col: str = "user_id",
    score_col: str = "score",
    label_col: str = "label",
    weight_action: str | None = None,
    action_col: str = "action",
) -> DataFrame:
    """A11: per-user AUC, then impression-weighted mean per key group.

    Ref: AucCalcVersion5.java:343-392 (per-user rank walk) and :432-489
    (Σ(show_u·auc_u)/Σshow_u merge). Users with one-sided labels are
    excluded from the weighted mean, matching the reference's skip.
    Weight parity (java:448,463 — `show` rides on every user's rows):
    an AUC-valid user with NO weight-action rows stays in the group at
    weight 0 (left join + coalesce, contributing nothing to the mean
    but counted in `users`), and a group whose weights all sum to 0 is
    dropped, matching the reference's `if (showAll != 0)` gate —
    an inner join here would silently drop zero-weight users and emit
    a NULL mean for all-zero-weight groups.

    Exact-reproducibility note: the weighted sum Σ w_u·auc_u over
    thousands of users would be float-order-dependent, so auc_u is
    quantized to integer 1e-9 units (floor(auc·1e9 + 0.5) — identical
    in any IEEE-754 engine since auc_u itself is bit-exact) and the
    accumulation happens in int64. Deviation from the float result is
    ≤ 1e-9 — far below any model-quality signal — and the operator is
    deterministic under partitioning/AQE re-plans, which the naive
    float sum is not.
    """
    per_user = auc(df, [*keys, user_col], score_col, label_col)
    if weight_action is not None:
        weights = (
            df.filter(F.col(action_col) == weight_action)
            .groupBy(*keys, user_col)
            .agg(F.count(F.lit(1)).alias("w"))
        )
    else:
        weights = df.groupBy(*keys, user_col).agg(F.count(F.lit(1)).alias("w"))
    return _weighted_user_mean(per_user, weights, keys, user_col)


def uauc_from_counts(
    counts: DataFrame,
    keys: list[str],
    user_col: str = "user_id",
    score_col: str = "score",
    weight_col: str = "w_s",
) -> DataFrame:
    """UAUC over a PRE-AGGREGATED per-(keys, user, score) counts table
    with ``p_s``/``n_s`` (label counts at that score, NULL-score rows
    INCLUDED) and ``weight_col`` (weight-event count at that score —
    e.g. 'show' rows). The counts are already at the per-user AUC's
    exact grain, so the only remaining shuffles are the per-user window
    and the final per-group mean; NULL-score rows contribute weight but
    are excluded from the rank statistic, matching `uauc` on raw rows.

    Round 8 (guide §2.4): the per-user AUC and the per-user weight sum
    now compute in ONE pass — the weight rides the same per-user
    aggregation as the rank-sum term, so the separate weights groupBy
    and the AUC-vs-weights join are gone (the join was the plan's only
    join; its broadcast build was one Spark job per run). NULL-score
    rows stay in the stream: they sort first in the ascending cneg
    window and contribute 0 to it (conditional sum), and the
    positives/negatives/num2 aggregates skip them via the same
    NULL-when condition — bit-identical to the old
    filter-then-aggregate form, which pytest pins against `uauc` on
    raw rows. A user whose scores are ALL NULL aggregates to NULL
    positives -> NULL auc -> dropped by the same auc-IS-NOT-NULL
    filter that previously excluded them (they never entered per_user).
    The old form's left join + coalesce(w, 0) had no other effect:
    weights grouped a superset of per_user's groups, so the coalesce
    never fired, and groupBy keeps NULL keys exactly as the
    null-safe-equality join did."""
    nn = F.col(score_col).isNotNull()
    w = (
        Window.partitionBy(*keys, user_col)
        .orderBy(F.col(score_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cneg = F.coalesce(
        F.sum(F.when(nn, F.col("n_s")).otherwise(F.lit(0))).over(w),
        F.lit(0),
    )
    # same decimal accumulation rationale as auc_from_counts: p_s *
    # (2*cneg + n_s) is bounded by 2*P*N per group, past int64 at the
    # 100 TB scale this module targets
    per_user = (
        counts.withColumn("_cneg", cneg)
        .groupBy(*keys, user_col)
        .agg(
            F.sum(F.when(nn, F.col("p_s"))).alias("positives"),
            F.sum(F.when(nn, F.col("n_s"))).alias("negatives"),
            F.sum(
                F.when(
                    nn,
                    F.col("p_s").cast("decimal(20,0)")
                    * (F.lit(2) * F.col("_cneg") + F.col("n_s")),
                )
            ).alias("num2"),
            F.sum(weight_col).alias("w"),
        )
        .withColumn(
            "auc",
            F.when(
                (F.col("positives") > 0) & (F.col("negatives") > 0),
                F.col("num2").cast("double")
                / (F.lit(2.0) * F.col("positives") * F.col("negatives")),
            ),
        )
    )
    scaled = per_user.filter(F.col("auc").isNotNull()).withColumn(
        "auc_scaled", F.floor(F.col("auc") * F.lit(1e9) + F.lit(0.5))
    )
    return (
        scaled.groupBy(*keys)
        .agg(
            # decimal end to end — see _weighted_user_mean
            F.sum(
                F.col("w").cast("decimal(20,0)") * F.col("auc_scaled")
            ).alias("wsum"),
            F.sum("w").alias("wtotal"),
            F.count(F.lit(1)).alias("users"),
        )
        .filter(F.col("wtotal") != 0)
        .select(
            *keys,
            "users",
            (
                F.col("wsum").cast("double")
                / (F.lit(1e9) * F.col("wtotal").cast("double"))
            ).alias("uauc"),
        )
    )


def _weighted_user_mean(
    per_user: DataFrame,
    weights: DataFrame,
    keys: list[str],
    user_col: str,
) -> DataFrame:
    """The impression-weighted-mean tail shared by `uauc` and
    `uauc_from_counts` (ref: AucCalcVersion5.java:432-489)."""
    # null-safe weight join: groupBy keeps NULL-key groups (and auc()
    # emits them), but a plain equality join would never match them —
    # every user in a NULL-key group would get w=0 and the group would
    # silently vanish from uauc while auc() reports it
    pu = per_user.filter(F.col("auc").isNotNull()).alias("_pu")
    wt = weights.alias("_wt")
    cond = None
    for k in [*keys, user_col]:
        c = F.col(f"_pu.{k}").eqNullSafe(F.col(f"_wt.{k}"))
        cond = c if cond is None else cond & c
    j = pu.join(wt, cond, "left").select(
        "_pu.*", F.coalesce(F.col("_wt.w"), F.lit(0)).alias("w")
    )
    scaled = j.withColumn(
        "auc_scaled", F.floor(F.col("auc") * F.lit(1e9) + F.lit(0.5))
    )
    return (
        scaled.groupBy(*keys)
        .agg(
            # decimal accumulation end to end: auc_scaled is up to 1e9,
            # so a single user with w > ~9.2e9 would wrap an int64
            # PRODUCT before any cast — cast one operand first so both
            # the multiply and the sum run in decimal
            F.sum(
                F.col("w").cast("decimal(20,0)") * F.col("auc_scaled")
            ).alias("wsum"),
            F.sum("w").alias("wtotal"),
            F.count(F.lit(1)).alias("users"),
        )
        .filter(F.col("wtotal") != 0)
        .select(
            *keys,
            "users",
            (
                F.col("wsum").cast("double")
                / (F.lit(1e9) * F.col("wtotal").cast("double"))
            ).alias("uauc"),
        )
    )


def label_dedup_anti_join(
    shows: DataFrame, clicks: DataFrame, keys: list[str]
) -> DataFrame:
    """J8: shows not already clicked — the one SQL string in the whole
    reference repo is a NOT IN subquery (AucCalcVersion5.java:261-264);
    we declare the anti join directly. Deviation, deliberately: NOT IN
    has null-collapse semantics (a single NULL click key makes the
    predicate NULL for EVERY show — zero rows survive), which is a SQL
    footgun, not the query's intent; the anti join (= NOT EXISTS, the
    oracle's form) treats NULL keys as matching nothing and keeps the
    non-matching shows.
    """
    return shows.join(clicks, on=keys, how="left_anti")


def effective_score(
    score_col: str = "score",
    recall_score_col: str = "recall_score",
    model_col: str = "predict_model_id",
) -> "Column":
    """The reference's recall-score fallback: rows whose model id is
    the '-2' sentinel score by `recall_score` instead of `score`.

    Ref: AucCalcVersion5.java:287-289 — the AUC input selection swaps
    in recallScore when predictModelId == "-2" (a recall-only entry
    with no ranking-model score). Pure column expression; apply before
    `auc`/`uauc`:

        df.withColumn("score", effective_score())
    """
    return F.when(
        F.col(model_col) == "-2", F.col(recall_score_col)
    ).otherwise(F.col(score_col))
