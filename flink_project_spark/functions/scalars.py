"""Scalar function surface — SURVEY §2.9 (F1-F7).

JSON parsing, URL-query extraction, yyyyMMdd partition-time math,
scientific-notation timestamp casts, sentinel handling. All expressed as
Column expressions (JVM-side, codegen) — never row-level Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def json_get_int(col: Column | str, field: str) -> Column:
    """F1: extract an int field from a JSON string column.

    Ref: every log parse (OfflineDataSetUtils.java:74,89-104 via fastjson).
    get_json_object returns null on corrupt rows — the engine's analog of
    the reference's drop-malformed-lines behavior
    (OfflineDataSetUtils.java:72-81): filter on isNotNull downstream.
    try_cast, not cast: under ANSI mode (Spark 4's default, including
    the driver's vanilla session) a plain cast of a non-integer field
    value ('xyz', '1.5') throws CAST_INVALID_INPUT and kills the scan
    instead of dropping the row — the exact opposite of the documented
    contract.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{field}").try_cast("int")


def parse_json_schema(col: Column | str, schema: T.StructType) -> Column:
    """F1: full schema-on-read parse (from_json; null on malformed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, schema)


def url_query_param(request: Column | str, param: str) -> Column:
    """F2: extract one query parameter from an nginx-style request line
    'GET /path?a=1&b=2 HTTP/1.1'.

    Ref: OfflineDataSetUtils.java:115-167 (manual indexOf/substring
    walk). regexp_extract keeps it in codegen; empty match -> ''.
    """
    import re as _re

    c = F.col(request) if isinstance(request, str) else request
    # param value = run of non-&/space chars after 'param='; the param
    # name is regex-escaped so 'user.id' matches literally and bracketed
    # names ('q[0]') cannot break the pattern
    return F.regexp_extract(c, rf"[?&]{_re.escape(param)}=([^&\s]*)", 1)


def yyyymmdd(ts: Column | str) -> Column:
    """F4: partition-day key. Ref: flink-statistics TimeUtils.java:10-29."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "yyyyMMdd")


def yyyymmddhh(ts: Column | str) -> Column:
    """F4: partition-hour key. Ref: OfflineUtils.java:9-50."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "yyyyMMddHH")


def reverse_rowkey(ts_ms: Column | str) -> Column:
    """F4: HBase descending rowkey trick — Long.MAX_VALUE - epoch_ms.

    Ref: ActionLogJob.java:615-632 (newest-first scans).
    """
    c = F.col(ts_ms) if isinstance(ts_ms, str) else ts_ms
    return F.lit(9223372036854775807) - c.cast("long")


def sci_notation_to_long(col: Column | str) -> Column:
    """F7: '1.5673E9'-style string timestamp -> long, replicating the
    reference's (long) Double.parseDouble(...) two-step
    (flink-process entries/ActionLog.java:41) — INCLUDING Java's
    narrowing-cast saturation: values past the long range clamp to
    Long.MIN/MAX_VALUE and NaN becomes 0, keeping the row. Under ANSI
    mode (Spark 4's default) a plain double->long cast would instead
    throw CAST_OVERFLOW and kill a whole scan on one bad timestamp.
    An unparseable string still yields NULL (Java would throw in
    parseDouble; NULL-and-filter is this engine's documented
    drop-malformed analog, see json_get_int).
    """
    c = F.col(col) if isinstance(col, str) else col
    d = c.try_cast("double")
    long_max = 9223372036854775807
    long_min = -9223372036854775808
    return (
        F.when(F.isnan(d), F.lit(0).cast("long"))
        .when(d >= F.lit(float(long_max)), F.lit(long_max))
        .when(d <= F.lit(float(long_min)), F.lit(long_min))
        .otherwise(d.try_cast("long"))
    )


def ratio_floor(col: Column | str, eps: float = 1e-5) -> Column:
    """F5: metric post-processing — ratios below eps clamp to 0.

    Ref: OfflineJob.java:289-299,410-423.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c < eps, F.lit(0.0)).otherwise(c)
