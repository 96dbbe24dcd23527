"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query; the driver compares
row count + schema + order-insensitive value hash at sf0.01.

Determinism strategy (so Spark and DuckDB hash-match bit-exactly):
- fixtures derive from the driver tables with dual-dialect SQL that
  evaluates identically in both engines (flink_project_spark.fixtures);
- double sums go through DECIMAL casts (exact, order-independent) and are
  exposed as DOUBLE at the end;
- ratios are single IEEE-double operations on exactly-equal inputs;
- integer aggregates are CAST to BIGINT in DuckDB (its SUM yields HUGEINT).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_project_spark import fixtures as FX
from flink_project_spark.operators import relational as R
from flink_project_spark.operators import windows as W


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _valid_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return FX.fixture_df(spark, sf_dir, "valid_actions")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return FX.load_tables(spark, sf_dir)["events"]


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return FX.load_tables(spark, sf_dir)["lineitem"]


# ---------------------------------------------------------------------------
# entry — flagship smoke query
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-resolution event-time dashboard (T5 parity).

    Ref: flink-statistics ActionLogJobSecond.java:207-231 — per
    (resolution, window, event_type) counts with the +8h-aligned day
    window, expressed as epoch-aligned F.window() aggregations.
    """
    events = _events(spark, "/root/testdata/sf0.001")
    return W.multi_resolution_counts(events, "ts", ["event_type"])


# ---------------------------------------------------------------------------
# queries — engine side
# ---------------------------------------------------------------------------


def q_scene_uv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.scene_uv(_valid_actions(spark, sf_dir))


def q_action_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.action_counts(_valid_actions(spark, sf_dir))


def q_scene_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.scene_ctr(_valid_actions(spark, sf_dir))


def q_ctr_abnormal_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.user_ctr_abnormal_ratio(_valid_actions(spark, sf_dir), threshold=0.8)


def q_show_click_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.show_click_full_outer(_valid_actions(spark, sf_dir))


def q_transfer_error_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.transfer_error_ratio(
        _valid_actions(spark, sf_dir), FX.fixture_df(spark, sf_dir, "recall_log")
    )


def q_user_fluctuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.user_fluctuation(_valid_actions(spark, sf_dir))


def q_metric_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.metric_pivot(_valid_actions(spark, sf_dir))


def q_event_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.tumbling_counts(
        _events(spark, sf_dir), "ts", "5 minutes", ["event_type"]
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped aggregation over lineitem — the engine's headline
    scan+agg benchmark (grouped sums via exact DECIMAL accumulation).
    """
    li = _lineitem(spark, sf_dir)
    dec = lambda c, p, s: F.col(c).cast(f"decimal({p},{s})")  # noqa: E731
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(22,6)"
    )
    charge = (
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    ).cast("decimal(24,8)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity", 18, 2)).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice", 18, 2)).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (
                F.sum(dec("l_quantity", 18, 2)).cast("double") / F.count(F.lit(1))
            ).alias("avg_qty"),
            (
                F.sum(dec("l_extendedprice", 18, 2)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "scene_uv": q_scene_uv,
        "action_counts": q_action_counts,
        "scene_ctr": q_scene_ctr,
        "ctr_abnormal_users": q_ctr_abnormal_users,
        "show_click_full_outer": q_show_click_full_outer,
        "transfer_error_ratio": q_transfer_error_ratio,
        "user_fluctuation": q_user_fluctuation,
        "metric_pivot": q_metric_pivot,
        "event_window_counts": q_event_window_counts,
        "pricing_summary": q_pricing_summary,
    }


# ---------------------------------------------------------------------------
# oracles — DuckDB side
# ---------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    V = FX.fixture_cte  # noqa: N806
    return {
        "scene_uv": V("valid_actions")
        + """
        SELECT scene_id, count(DISTINCT user_id) AS uv
        FROM valid_actions GROUP BY scene_id
        """,
        "action_counts": V("valid_actions")
        + """
        SELECT scene_id, action, count(*) AS cnt
        FROM valid_actions GROUP BY scene_id, action
        """,
        "scene_ctr": V("valid_actions")
        + """
        SELECT scene_id,
               CAST(SUM(CASE WHEN action='show' THEN 1 ELSE 0 END) AS BIGINT) AS shows,
               CAST(SUM(CASE WHEN action='click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
               CASE
                 WHEN SUM(CASE WHEN action='show' THEN 1 ELSE 0 END) > 0
                   THEN CAST(SUM(CASE WHEN action='click' THEN 1 ELSE 0 END) AS DOUBLE)
                        / CAST(SUM(CASE WHEN action='show' THEN 1 ELSE 0 END) AS DOUBLE)
                 WHEN SUM(CASE WHEN action='click' THEN 1 ELSE 0 END) > 0
                   THEN 1.7976931348623157e308
                 ELSE 0.0
               END AS ctr
        FROM valid_actions GROUP BY scene_id
        """,
        "ctr_abnormal_users": V("valid_actions")
        + """
        , per_user AS (
          SELECT scene_id, user_id,
                 SUM(CASE WHEN action='show' THEN 1 ELSE 0 END) AS shows,
                 SUM(CASE WHEN action='click' THEN 1 ELSE 0 END) AS clicks
          FROM valid_actions GROUP BY scene_id, user_id
        )
        SELECT scene_id,
               count(*) AS users,
               CAST(SUM(CASE WHEN (shows=0 AND clicks>0)
                              OR (shows>0 AND CAST(clicks AS DOUBLE)/CAST(shows AS DOUBLE) > 0.8)
                        THEN 1 ELSE 0 END) AS BIGINT) AS abnormal_users,
               CAST(SUM(CASE WHEN (shows=0 AND clicks>0)
                              OR (shows>0 AND CAST(clicks AS DOUBLE)/CAST(shows AS DOUBLE) > 0.8)
                        THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS abnormal_ratio
        FROM per_user GROUP BY scene_id
        """,
        "show_click_full_outer": V("valid_actions")
        + """
        , s AS (
          SELECT scene_id, item_id, count(*) AS shows
          FROM valid_actions WHERE action='show' GROUP BY scene_id, item_id
        ), c AS (
          SELECT scene_id, item_id, count(*) AS clicks
          FROM valid_actions WHERE action='click' GROUP BY scene_id, item_id
        )
        SELECT COALESCE(s.scene_id, c.scene_id) AS scene_id,
               COALESCE(s.item_id, c.item_id) AS item_id,
               COALESCE(s.shows, 0) AS shows,
               COALESCE(c.clicks, 0) AS clicks
        FROM s FULL OUTER JOIN c
          ON s.scene_id = c.scene_id AND s.item_id = c.item_id
        """,
        "transfer_error_ratio": V("valid_actions", "recall_log")
        + """
        , rk AS (
          SELECT DISTINCT scene_id, user_id, item_id FROM recall_log
        ), total AS (
          SELECT scene_id, count(*) AS total_actions
          FROM valid_actions GROUP BY scene_id
        ), matched AS (
          SELECT a.scene_id, count(*) AS matched_actions
          FROM valid_actions a
          JOIN rk ON a.scene_id = rk.scene_id
                 AND a.user_id = rk.user_id AND a.item_id = rk.item_id
          GROUP BY a.scene_id
        )
        SELECT t.scene_id, t.total_actions,
               COALESCE(m.matched_actions, 0) AS matched_actions,
               1.0 - CAST(COALESCE(m.matched_actions, 0) AS DOUBLE)
                     / CAST(t.total_actions AS DOUBLE) AS error_ratio
        FROM total t LEFT JOIN matched m ON t.scene_id = m.scene_id
        """,
        "user_fluctuation": V("valid_actions")
        + """
        , pa AS (
          SELECT scene_id, action, count(DISTINCT user_id) AS action_uv
          FROM valid_actions GROUP BY scene_id, action
        ), tot AS (
          SELECT scene_id, count(DISTINCT user_id) AS total_uv
          FROM valid_actions GROUP BY scene_id
        )
        SELECT pa.scene_id, pa.action, pa.action_uv, tot.total_uv,
               CAST(pa.action_uv AS DOUBLE) / CAST(tot.total_uv AS DOUBLE) AS uv_share
        FROM pa LEFT JOIN tot ON pa.scene_id = tot.scene_id
        """,
        "metric_pivot": V("valid_actions")
        + """
        , counts AS (
          SELECT scene_id,
                 CAST(SUM(CASE WHEN action='show' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_show,
                 CAST(SUM(CASE WHEN action='click' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_click,
                 CAST(SUM(CASE WHEN action='detailPageShow' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_detail_page_show,
                 CAST(SUM(CASE WHEN action='other' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_other
          FROM valid_actions GROUP BY scene_id
        )
        SELECT scene_id, cnt_show, cnt_click, cnt_detail_page_show, cnt_other,
               CAST(cnt_show AS VARCHAR) || '_' || CAST(cnt_click AS VARCHAR)
               || '_' || CAST(cnt_detail_page_show AS VARCHAR)
               || '_' || CAST(cnt_other AS VARCHAR) AS metrics_joined
        FROM counts
        """,
        "event_window_counts": """
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
               event_type,
               count(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
        """,
        "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,8))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """,
    }


# DuckDB allows only one WITH per query; fixture_cte emits the first WITH,
# so inline ", x AS (...)" markers merge into it.
def _merge_with(sql: str) -> str:
    return sql.replace(",", ",")


_raw_oracle_sql = oracle_sql


def oracle_sql() -> dict[str, str]:  # noqa: F811
    return {k: _merge_with(v) for k, v in _raw_oracle_sql().items()}
