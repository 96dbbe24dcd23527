"""Deterministic fixture derivations over the driver's parquet tables.

The reference workload consumes recommendation logs (action logs, recall
logs, board lists, whitelists, sensor streams — see FIXTURES.md). The
driver provides a TPC-H-ish star schema + ``events``/``documents``/
``embeddings`` tables (TESTDATA.md). This module derives the reference's
input record shapes from those tables **with SQL that renders in both
Spark SQL and DuckDB dialects**, so every engine query has an exact
DuckDB oracle: the oracle re-derives the identical fixture with a CTE.

Reference schemas being modeled:
- action_log: flink-statistics .../entries/OfflineActionLog.java:10-13
  (sceneId,userId,itemId,action) + contextExist gate
  (OfflineDataSetUtils.java:89-94) + AUC variant label/channel
  (flink-auccalc .../entries/ActionLog.java:10-18)
- recall_log: flink-auccalc .../entries/RecallLog.java:9-13
  (scores arrive as strings, parsed at AucCalcVersion5.java:224-252)
- boards: flink-itemcf .../huaban/ShuJuStat.java:58-67
- whitelist: flink-itemcf .../utils/PetalDataSetUtils.java:94-106
- sensor: flink-base .../entries/SensorReading.scala:8

Determinism contract: every expression used here evaluates bit-identically
in Spark and DuckDB (integer modulo, string concat, CASE, C-style printf
of binary64, epoch-millis extraction).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# dialect token -> (spark_sql, duckdb_sql)
_DIALECT = {
    "STR": ("STRING", "VARCHAR"),
    # epoch milliseconds from a timestamp column
    "EPOCH_MS": ("unix_millis", "epoch_ms"),
    # C-style printf: java.util.Formatter vs duckdb printf — both produce
    # the correctly-rounded fixed decimal rendering of the binary64 value
    "PRINTF": ("format_string", "printf"),
}


def render(sql: str, dialect: str) -> str:
    """Render a dual-dialect SQL template for 'spark' or 'duckdb'.

    Unknown dialects are an error here, not a silent DuckDB fallback —
    feeding duckdb-rendered tokens to spark.sql() fails far from the
    typo (UNRESOLVED_ROUTINE deep in a fixture plan)."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect {dialect!r} (spark|duckdb)")
    idx = 0 if dialect == "spark" else 1
    out = sql
    for token, variants in _DIALECT.items():
        out = out.replace("{%s}" % token, variants[idx])
    return out


# ---------------------------------------------------------------------------
# Fixture SQL templates (dual-dialect). All reference the driver tables.
# ---------------------------------------------------------------------------

# F1 action_log — user behavior events with parse-gate column.
# 'view'/'signup' -> show, 'purchase' -> detailPageShow mirrors the
# show:detailPageShow imbalance in the reference logs; label=1 iff click
# (flink-auccalc ActionLog.java:18 semantics).
ACTION_LOG_SQL = """
SELECT
  'scene_' || CAST(user_id % 5 AS {STR})                     AS scene_id,
  'user_'  || CAST(user_id AS {STR})                         AS user_id,
  'item_'  || CAST(event_id % 97 AS {STR})                   AS item_id,
  CASE event_type
    WHEN 'view'     THEN 'show'
    WHEN 'signup'   THEN 'show'
    WHEN 'click'    THEN 'click'
    WHEN 'purchase' THEN 'detailPageShow'
    ELSE 'other' END                                         AS action,
  CASE WHEN event_id % 20 = 0 THEN '0' ELSE '1' END          AS context_exist,
  {EPOCH_MS}(ts)                                             AS action_time,
  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END           AS label,
  'channel_' || CAST(event_id % 3 AS {STR})                  AS channel,
  value                                                      AS score
FROM events
"""

# F2 recall_log — scored candidates; scores as strings (reference parse
# fidelity: RecallLog.java:9-13). item_id mapping overlaps ~partially with
# action_log's so joins have realistic selectivity.
# NB: recall_score uses value*0.25 (exact binary scaling) — java.util.Formatter
# rounds HALF_UP on the *shortest decimal repr* while C printf rounds the
# exact binary value, so decimal-half products (e.g. 1.45*0.9=1.305) render
# differently; *0.25 with %.4f never lands on a rounding boundary.
RECALL_LOG_SQL = """
SELECT
  'scene_' || CAST(user_id % 5 AS {STR})                     AS scene_id,
  'user_'  || CAST(user_id AS {STR})                         AS user_id,
  'item_'  || CAST((event_id * 7) % 97 AS {STR})             AS item_id,
  {PRINTF}('%.2f', value)                                    AS score,
  {PRINTF}('%.4f', value * 0.25)                             AS recall_score,
  {EPOCH_MS}(ts)                                             AS recall_time,
  CASE WHEN event_id % 13 = 1 THEN '-2'
       ELSE 'model_' || CAST(event_id % 4 AS {STR}) END      AS predict_model_id
FROM events
WHERE event_id % 4 <> 0
"""

# F3 boards — item<->board membership for pair-generation coverage
# (ShuJuStat.java:58-67 flattened: one row per (item, board)).
BOARDS_SQL = """
SELECT DISTINCT
  'item_'  || CAST(l_partkey % 97 AS {STR})                  AS item_id,
  'board_' || CAST(l_suppkey % 13 AS {STR})                  AS board_id
FROM lineitem
"""

# F4 whitelist — approved item ids (PetalDataSetUtils.java:94-106).
# ~60% of the item_id key space (FIXTURES.md: both join sides non-empty).
WHITELIST_SQL = """
SELECT DISTINCT
  'item_' || CAST(p_partkey % 97 AS {STR})                   AS pin_id
FROM part
WHERE p_size >= 25 AND p_partkey % 97 < 60
"""

# F5 sensor — streaming numeric telemetry (SensorReading.scala:8).
SENSOR_SQL = """
SELECT
  'sensor_' || CAST(user_id % 10 AS {STR})                   AS id,
  {EPOCH_MS}(ts)                                             AS timestamp,
  value                                                      AS temperature,
  ts                                                         AS event_ts
FROM events
"""

# Parse-gate applied fixture — the reference drops rows failing the
# contextExist gate / blank ids during flatMap parse
# (OfflineDataSetUtils.java:89-94, ActionLogJobSecond.java:92-103).
VALID_ACTIONS_SQL = """
SELECT * FROM action_log
WHERE context_exist = '1'
  AND trim(user_id) <> '' AND trim(item_id) <> ''
"""

FIXTURE_SQL = {
    "action_log": ACTION_LOG_SQL,
    "valid_actions": VALID_ACTIONS_SQL,
    "recall_log": RECALL_LOG_SQL,
    "boards": BOARDS_SQL,
    "whitelist": WHITELIST_SQL,
    "sensor": SENSOR_SQL,
}

# fixture -> fixtures it references (must be materialized first)
DEPENDS: dict[str, tuple[str, ...]] = {
    "valid_actions": ("action_log",),
}


def _expand(names: tuple[str, ...]) -> list[str]:
    """Dependency-ordered unique fixture list."""
    ordered: list[str] = []

    def add(n: str) -> None:
        for d in DEPENDS.get(n, ()):
            add(d)
        if n not in ordered:
            ordered.append(n)

    for n in names:
        add(n)
    return ordered


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all driver parquet tables as DataFrames.

    Timestamp columns arrive in one of two physical shapes depending on
    the testdata generation: parquet TIMESTAMP(NANOS) — which Spark
    reads as a long under nanosAsLong and we truncate to microseconds,
    exactly what DuckDB's parquet reader does — or parquet
    TIMESTAMP(MICROS) isAdjustedToUTC=false. For the latter,
    ``inferTimestampNTZ.enabled=false`` makes Spark read the stored
    micros directly as the session-zoned TIMESTAMP (the pre-3.4
    behavior): with the session pinned UTC (session.py) that is
    micros-identical to DuckDB treating the naive value as UTC, AND it
    keeps the column a bare scan column — a cast/withColumn
    normalization here would sit between the scan and every date filter
    and break parquet predicate pushdown (e.g. pricing_summary's
    l_shipdate range).
    """
    # runtime-settable: required when the harness passes its own session
    cached = _TABLE_CACHE.get(spark, {}).get(sf_dir)
    if cached is not None:
        return dict(cached)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    out: dict[str, DataFrame] = {}
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for name, dtype in df.dtypes:
            if name == "ts" and dtype == "bigint":
                # integer division: ns values (~1.7e18) exceed double
                # precision, so never round-trip through double
                df = df.withColumn(
                    name, F.timestamp_micros(F.expr(f"{name} DIV 1000"))
                )
        out[t] = df
    _TABLE_CACHE.setdefault(spark, {})[sf_dir] = dict(out)
    return out


# DataFrame handles are cheap immutable plan objects — memoize per
# (session, sf_dir) so the 45-query driver loop doesn't re-list files and
# re-read 10 parquet footers per query. WeakKeyDictionary keyed on the
# SESSION OBJECT: entries die with their session (no dead-context plans
# served after an id() reuse, no growth across sessions), and sibling
# sessions sharing one SparkContext stay distinct (temp views are
# per-session, so an applicationId key would wrongly skip registration
# for the second sibling).
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, dict[str, DataFrame]]]" = (
    weakref.WeakKeyDictionary()
)
# session -> sf_dir whose tables are CURRENTLY bound to the views
# (a set keyed by (session, sf_dir) would wrongly skip re-binding after
# the same session switches to a different scale factor and back)
_REGISTERED: "weakref.WeakKeyDictionary[SparkSession, str]" = (
    weakref.WeakKeyDictionary()
)


def clear_tables(spark: SparkSession | None = None) -> None:
    """Forget the memoized table handles / view registrations.

    DataFrame handles hold no executor memory (plan objects only), but a
    long-lived session switching across many sf_dirs accumulates stale
    entries — this is the companion lifecycle hook to ``cache.clear``.
    """
    if spark is None:
        _TABLE_CACHE.clear()
        _REGISTERED.clear()
    else:
        _TABLE_CACHE.pop(spark, None)
        _REGISTERED.pop(spark, None)


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register the driver tables as temp views (idempotent, memoized)."""
    if _REGISTERED.get(spark) == sf_dir:
        return
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    _REGISTERED[spark] = sf_dir


def fixture_df(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Build a fixture DataFrame via Spark SQL over the driver tables.

    Dependent fixtures are registered as temp views first.
    """
    register_tables(spark, sf_dir)
    result: DataFrame | None = None
    for n in _expand((name,)):
        result = spark.sql(render(FIXTURE_SQL[n], "spark"))
        result.createOrReplaceTempView(n)
    assert result is not None
    return result


def fixture_cte(*names: str) -> str:
    """DuckDB WITH-clause prelude re-deriving the named fixtures
    (dependencies expanded, dependency order preserved).

    Usage: oracle = fixture_cte("action_log") + "SELECT ... FROM action_log"
    """
    parts = [
        f"{n} AS ({render(FIXTURE_SQL[n], 'duckdb')})" for n in _expand(names)
    ]
    return "WITH " + ",\n".join(parts) + "\n"
