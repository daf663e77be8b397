"""Query registry — the driver-graded surface (SURVEY.md §2).

Each operator registers a callable ``(spark, sf_dir) -> DataFrame``
under a stable key, optionally with a DuckDB-runnable ANSI-SQL oracle
string. The driver hash-compares (row count + schema + order-insensitive
value hash) the Spark result against the oracle at sf0.01, so:

- every computed/aggregate column is aliased identically on both sides;
- float aggregates are rounded to a fixed precision (sum of doubles is
  order-sensitive in the last ulps; rounding pins the hash); exact
  pinned SUMs use the limb primitives in ``exact.py`` — never
  ``SUM(CAST(x AS DECIMAL))`` on the Spark side (heap-decimal buffer
  tax) and never raw BIGINT sums where 100 TB group sizes overflow;
- randomized/approximate ops register *without* an oracle (rows-only).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[..., Any]] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None):
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``key``.

    ``oracle`` is the equivalent DuckDB SQL over the pre-registered
    views (region nation customer supplier part orders lineitem events
    documents embeddings); omit it for ops that cannot hash-match a
    different engine (LSH, approx sketches, binary payloads).
    """

    def deco(fn):
        prev = QUERIES.get(key)
        # a duplicate registration silently SHADOWS the earlier (often
        # driver-green) implementation — caught live in r10 when a new
        # scan_xml_roundtrip overwrote the r9 one. Re-registering from
        # the same module stays legal (module re-import in long-lived
        # test sessions); a different module is an error. The identity
        # is (module, qualname) — qualname alone would miss the exact
        # incident class, since both functions follow the
        # `def <key>` naming convention.
        if prev is not None and (
            getattr(prev, "__module__", None),
            getattr(prev, "__qualname__", None),
        ) != (getattr(fn, "__module__", "?"), getattr(fn, "__qualname__", "?")):
            raise ValueError(
                f"query key {key!r} already registered by "
                f"{getattr(prev, '__module__', '?')}."
                f"{getattr(prev, '__qualname__', '?')}"
            )
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = " ".join(oracle.split())
        return fn

    return deco
