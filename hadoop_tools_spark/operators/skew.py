"""Skew-handling utilities (SURVEY.md §4.2 "skew handling"; SCALE.md).

AQE's skew-join splitting handles discovered skew at runtime; salting
handles *known* pathological keys (null keys, power-law users) before
the shuffle exists. `salted_join` is the manual pattern: explode the
small side S×, scatter the big side across the S replicas with a
deterministic salt, join on (key, salt) — the hot key's rows spread
over S tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: join types for which replicating the small side is semantics-preserving.
#: right/full outer are NOT: an unmatched small-side row would surface once
#: per salt replica (n_salts duplicates).
_SALTABLE_HOW = frozenset(
    {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
     "left_anti", "leftanti", "semi", "anti"}
)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted across ``n_salts`` replicas
    of the small side.

    Result is identical to ``big.join(small, big[big_key] ==
    small[small_key], how)`` (asserted in tests/test_skew.py); the
    physical shuffle keys become (key, salt), so a key holding p% of
    the rows occupies p%/n_salts of the widest task instead of p%.

    The salt is derived from the big row's full content
    (``xxhash64`` over every column), so it is deterministic across
    task retries and speculative re-execution — a retried partition
    re-salts its rows identically, keeping the join exactly-once.
    Identical duplicate rows share a salt, which only matters if the
    skew *is* exact duplicates; distinct rows under a hot key spread
    uniformly.

    ``how`` is restricted to join types where replicating the small
    side cannot change semantics (inner / left outer / semi / anti).
    ``right`` and ``full_outer`` would emit each unmatched small-side
    row once per replica; express those as a left-form join from the
    other side instead.
    """
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SALTABLE_HOW
    }:
        raise ValueError(
            f"salted_join does not support how={how!r}: replicating the "
            "small side duplicates its unmatched rows under right/full "
            "outer joins. Rewrite as a left-form join from the other side."
        )
    if n_salts < 1:
        # range(n<=0) is empty: a left join would return every big row
        # unmatched — plausible-looking but silently wrong — and
        # pmod(x, 0) dies mid-job under ANSI, far from the call site
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    # collision-proof working column: silently replacing a user column
    # named '_salt' would drop it from the result (and corrupt the
    # salt); an existing column on the small side would make the join
    # condition ambiguous
    sc = "_salt"
    while sc in big.columns or sc in small.columns:
        sc = "_" + sc
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn(sc, salt.cast("int"))
    small_s = small.join(
        F.broadcast(
            big.sparkSession.range(n_salts).select(
                F.col("id").cast("int").alias(sc)
            )
        )
    )
    out = big_s.join(
        small_s,
        (big_s[big_key] == small_s[small_key]) & (big_s[sc] == small_s[sc]),
        how,
    )
    return out.drop(sc)
