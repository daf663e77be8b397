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
    Deterministic salt (xxhash64 of the whole row's key + a stable
    row fingerprint would be overkill — a key-derived spread is
    enough for correctness and stability across retries).
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt.cast("int"))
    small_s = small.join(
        F.broadcast(
            big.sparkSession.range(n_salts).select(
                F.col("id").cast("int").alias("_salt")
            )
        )
    )
    out = big_s.join(
        small_s,
        (big_s[big_key] == small_s[small_key]) & (big_s["_salt"] == small_s["_salt"]),
        how,
    )
    return out.drop("_salt")
