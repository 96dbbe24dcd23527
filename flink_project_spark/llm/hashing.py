"""Cross-engine deterministic hashing primitives.

Every dedup/LSH operator must be verifiable against a DuckDB oracle, so
all pseudo-randomness derives from md5 — which Spark, DuckDB and Python
hashlib evaluate identically (lowercase hex of the RFC 1321 digest).

Three shared constructions:

- **hex-string minhash**: ``min(md5(seed || '|' || shingle))`` compared
  lexicographically. Fixed-width lowercase hex makes byte-lexicographic
  order identical to numeric order of the 128-bit value, so no
  hex->integer conversion is needed at all.
- **v32**: ``int(md5(s)[:8], 16)`` — a 32-bit integer hash. Spark:
  ``conv(substr(md5(s),1,8),16,10)``; DuckDB: nibble-expansion via
  ``strpos('0123456789abcdef', ...)`` (DuckDB's own md5_number_* use
  little-endian byte order, which conv cannot cheaply reproduce).
- **driver-side plane weights**: LSH hyperplanes are materialized as
  Python-computed literal arrays (hashlib md5), embedded into BOTH the
  Spark plan and the oracle SQL text — zero in-engine randomness.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

_NIBBLE_MULT = [16 ** (7 - i) for i in range(8)]  # 16^7 .. 16^0


def v32(col: Column) -> Column:
    """First 32 bits of md5(col) as a non-negative LongType column."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def v32_from_hex(hex_col: Column) -> Column:
    """v32 from an already-computed md5 hex column — lets a pipeline
    materialize md5 once per row and derive the integer hash from it."""
    return F.conv(F.substring(hex_col, 1, 8), 16, 10).cast("long")


def v32_sql(expr: str) -> str:
    """DuckDB SQL computing the identical value for a VARCHAR expr."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1)"
        f" * CAST({m} AS BIGINT)"
        for i, m in enumerate(_NIBBLE_MULT)
    )
    return f"({terms})"


def v32_from_hex_sql(hex_expr: str) -> str:
    """DuckDB SQL turning an already-computed md5 hex VARCHAR expr into
    the v32 integer — lets a CTE materialize md5 once per row instead of
    inlining it 8x (once per nibble)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({hex_expr}, {i + 1}, 1)) - 1)"
        f" * CAST({m} AS BIGINT)"
        for i, m in enumerate(_NIBBLE_MULT)
    )
    return f"({terms})"


def v32_py(s: str) -> int:
    """Python twin (for driver-side plane generation and stub decoders)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


_NIBBLE_MULT_60 = [16 ** (14 - i) for i in range(15)]  # 16^14 .. 16^0


def v60(col: Column) -> Column:
    """First 60 bits (15 hex nibbles) of md5(col) as LongType — the
    wide-signature twin of `v32` for operators whose hash SPACE, not
    just key width, must outgrow the corpus (e.g. SimHash bit majority:
    32 signature bits saturate around 10^4 documents on natural-text
    word distributions — see `doc_simhash`). 60 is the widest md5
    prefix whose value and whose 2^j bit weights all stay inside a
    signed 64-bit long in both engines (bit 63 is the sign; 61-63 would
    need unsigned semantics DuckDB and Spark disagree on)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def v60_sql(expr: str) -> str:
    """DuckDB SQL computing the identical 60-bit value (nibble
    expansion, same construction as `v32_sql`)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1)"
        f" * CAST({m} AS BIGINT)"
        for i, m in enumerate(_NIBBLE_MULT_60)
    )
    return f"({terms})"


def v60_from_hex_sql(hex_expr: str) -> str:
    """DuckDB SQL turning an already-computed md5 hex VARCHAR expr into
    the v60 integer — the 15-nibble twin of `v32_from_hex_sql`, so a
    CTE can materialize md5 once per row instead of inlining it 15x."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({hex_expr}, {i + 1}, 1)) - 1)"
        f" * CAST({m} AS BIGINT)"
        for i, m in enumerate(_NIBBLE_MULT_60)
    )
    return f"({terms})"


def v60_py(s: str) -> int:
    """Python twin of `v60`."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def plane_weights(n_planes: int, dim: int, salt: str = "plane") -> list[list[float]]:
    """Deterministic random-hyperplane weights in [-0.5, 0.5).

    weight[p][d] = v32(f"{salt}:{p}_{d}") / 2^32 - 0.5 — reproducible in
    any engine because the values are embedded as literals, not computed
    in-engine.
    """
    return [
        [v32_py(f"{salt}:{p}_{d}") / 4294967296.0 - 0.5 for d in range(dim)]
        for p in range(n_planes)
    ]
