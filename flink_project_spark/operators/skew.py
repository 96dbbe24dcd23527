"""Hot-key (skew) escape hatches for joins — SURVEY §2.4 at 100 TB.

The engine's default skew strategy is AQE: `session.py` enables
`spark.sql.adaptive.skewJoin.enabled`, which splits oversized shuffle
partitions of a sort-merge join at runtime. That covers the common
case with zero user code. `salted_join` is the manual escape hatch for
the cases AQE cannot help:

- the skewed join feeds a stage whose partitioning must be preserved
  (AQE's split changes the output partitioning of the join);
- the plan is not a sort-merge join (e.g. a forced shuffle-hash join);
- the skew is known ahead of time and the user wants a deterministic
  plan (capacity planning) rather than a runtime decision.

Mechanics: the big (skewed) side gets a uniform random salt in
[0, salt); the small side is replicated once per salt value via a
posexplode, and the join runs on (key, salt). A key that carried S
rows in one reducer now spreads over `salt` reducers at the cost of
replicating the small side `salt` times — the classic trade
(Beyond-AQE salting as described in the public Spark docs/talks;
same trick as `setops.top_k_per_group_salted` applies to windows).

`operators/profiling.key_skew_profile` computes the evidence (p99 /
max group sizes) for choosing `salt`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__skew_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
    seed: int | None = None,
) -> DataFrame:
    """Equi-join `big` with `small` on `on`, spreading each of big's
    keys over `salt` reducers.

    Only `inner` and `left` (big-side-preserving) joins are supported:
    replication of the small side would duplicate its unmatched rows
    under `right`/`full` semantics. The salt column never escapes.

    At 100 TB: `big` shuffles exactly once on (key, salt) — same bytes
    as the plain join, `salt`× better balance on hot keys; `small`
    shuffles `salt`× its (small) size. Row-for-row equivalent to
    `big.join(small, on, how)` (pinned by test).

    The salt is DETERMINISTIC (xxhash64 of the input partition id +
    the row's hashable columns, optionally mixed with `seed`), never
    F.rand(): a rand-derived JOIN KEY changes on partial stage
    recomputation after an executor loss — recomputed big-side rows
    would route to reducers that already committed (dropped rows) or
    re-run ones (duplicates), breaking exactly-once on exactly the
    large jobs the operator targets. Identical rows in one input
    partition share a salt; the partition id spreads a hot key's rows
    because they span many input partitions (the same construction as
    `setops.top_k_per_group_salted`).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} — "
            "right/full would duplicate unmatched small-side rows "
            "across salt replicas"
        )
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(
            f"input column {_SALT!r} collides with the salted join's "
            "working column; rename it first (it would be silently "
            "overwritten and dropped)"
        )
    # xxhash64 rejects map columns; hash the rest (falls back to the
    # partition id alone for a frame of only maps)
    hashable = [F.col(c) for c, t in big.dtypes if not t.startswith("map")]
    seed_cols = [F.lit(seed)] if seed is not None else []
    b = big.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(*seed_cols, F.spark_partition_id(), *hashable),
            F.lit(salt),
        ).cast("int"),
    )
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return b.join(s, on=[*on, _SALT], how=how).drop(_SALT)
