"""Exact order-free SUMs with primitive aggregation buffers.

The engine pins float aggregates to a fixed-point grid so reductions
are associative and bit-identical cross-engine (SURVEY §8 r5/r6: the
ROUND-on-double-SUM flake class). The first migration summed per-row
``DECIMAL(18,s)`` casts — exact, but Spark widens a decimal SUM past
18 digits, which falls off the compact (long-backed) decimal fast
path: the aggregation buffer becomes a heap Decimal per group and the
whole-stage-codegen loop allocates per row. Measured on q1 at sf0.1:
DECIMAL sums 1.56 s vs 0.26 s for BIGINT-unit sums — a 6× tax on
every pinned aggregate.

Plain ``SUM(BIGINT units)`` is fast but overflows int64 for the 100 TB
regime this engine targets (q1 groups lineitem into ~4 groups; at
sf100k that is ~1.5e11 rows/group × up to ~1.1e11 units/row for the
6-dp charge column ≈ 1.6e22 ≫ 2^63). The fix used here is multi-limb
accumulation — the SQL expression of a textbook multi-precision sum:

  split each per-row unit value into base-2^21 limbs
  (``pmod``/``shiftright`` — consistent floor-div/positive-mod pair,
  exact for negatives), SUM each limb as a primitive long, and
  recombine the handful of per-group limb totals in DECIMAL at
  projection time.

Every limb sum is bounded: |Σlo| < n·2^21 and |Σhi| ≤ n·max(|u|)/2^21
(2 limbs) — safe to n ≈ 4.4e12 rows/group with units up to 2^42, and
with 3 limbs to per-row values up to 2^63. The aggregation buffers
stay primitive longs (codegen, map-side combine), the decimal math
runs once per GROUP, and the result is bit-identical to the
DECIMAL-sum it replaces (same exact integer total, same final
decimal→double conversion).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: limb width in bits. 2^21 limbs bound every limb-sum well inside
#: int64 for n ≤ ~4.4e12 rows per group (≈ sf300k lineitem per q1
#: group) — raise limbs, not the width, if a new op needs more.
_SHIFT = 21
_M = 1 << _SHIFT


def sum_exact(u: Column, limbs: int = 2) -> Column:
    """Exact Σu over a BIGINT column as DECIMAL(38,0), order-free.

    ``limbs=2`` covers per-row |u| < 2^42 (every grid-pinned unit
    column in the engine: 6-dp charge tops out ~1.1e11 ≈ 2^37);
    ``limbs=3`` covers |u| up to 2^63 (squared-cents / cross-product
    moment sums). NULL rows are skipped by every limb consistently, so
    NULL/empty-group semantics match a plain SUM.
    """
    parts = []  # (limb column, 2^(S*i) weight)
    t = u
    for i in range(limbs - 1):
        parts.append((F.pmod(t, F.lit(_M)), _M**i))
        t = F.shiftright(t, _SHIFT)
    parts.append((t, _M ** (limbs - 1)))
    total = None
    for limb, weight in parts:
        term = F.sum(limb).cast("decimal(38,0)") * F.lit(weight)
        total = term if total is None else total + term
    return total.cast("decimal(38,0)")


def to_units(col: Column, scale: int) -> Column:
    """Pin ``col`` to the 1e-``scale`` grid as BIGINT units.

    ``floor(x·10^s + 0.5)`` is the repo's IEEE-exact half-up pin
    (KEYS.md conventions): for grid-valued data the product is within
    ~1e-11·10^s of an integer, and an exact k+0.5 midpoint would
    require x = (2k+1)/(2·10^s), whose lowest-terms denominator has a
    factor 5 — not a dyadic rational, so no double ever sits on one.
    Bit-identical to ``CAST(x AS DECIMAL(18,s))`` on such data
    (asserted over every pinned fixture column in
    tests/test_exact_sums.py).
    """
    return F.floor(col * F.lit(10**scale) + F.lit(0.5)).cast("long")


def sum_pinned(col: Column, scale: int) -> Column:
    """Drop-in for ``F.sum(col.cast(f"decimal(18,{scale})"))``.

    Returns the same exact DECIMAL value (scale ``scale``) with
    primitive long aggregation buffers. Append ``.cast("double")``
    exactly as call sites did with the decimal sum.
    """
    inv = "0." + "0" * (scale - 1) + "1" if scale > 0 else "1"
    return (
        sum_exact(to_units(col, scale))
        * F.expr(f"CAST({inv} AS DECIMAL({max(scale, 1)},{scale}))")
    )


def sum_exact_sql(expr: str, limbs: int = 2) -> str:
    """SQL-text twin of :func:`sum_exact`: exact Σ``expr`` (a BIGINT
    SQL expression) as DECIMAL(38,0) with primitive limb buffers.

    Why text and not Columns: a Column tree is built one py4j round
    trip per operator, and the limb machinery is ~10 operators per
    sum — measured 0.3–0.4 s of driver-side plan-build per migrated
    aggregate key at bench time (r7: agg_stats spent 0.40 s building
    vs 0.34 s executing). One ``F.expr`` call ships the whole tree as
    a string parsed JVM-side, collapsing that fixed cost; the
    resulting plan (and therefore the result) is identical.
    """
    total = []
    t = expr
    for i in range(limbs - 1):
        total.append(
            f"CAST(SUM(PMOD({t}, {_M})) AS DECIMAL(38,0)) * {_M**i}"
        )
        t = f"SHIFTRIGHT({t}, {_SHIFT})"
    total.append(
        f"CAST(SUM({t}) AS DECIMAL(38,0)) * {_M ** (limbs - 1)}"
    )
    return "CAST(" + " + ".join(total) + " AS DECIMAL(38,0))"


def sum_pinned_sql(expr: str, scale: int) -> str:
    """SQL-text twin of :func:`sum_pinned` for ``spark.sql`` queries.

    Emits the same limb decomposition so pure-SQL keys (sqlsurface.py)
    get the primitive-buffer fast path too. The ORACLE side keeps its
    plain ``SUM(CAST(... AS DECIMAL))`` — DuckDB sums decimals in
    int128, already exact and fast there.
    """
    u = f"CAST(FLOOR(({expr}) * {10**scale} + 0.5) AS BIGINT)"
    lo = f"CAST(SUM(PMOD({u}, {_M})) AS DECIMAL(38,0))"
    hi = f"CAST(SUM(SHIFTRIGHT({u}, {_SHIFT})) AS DECIMAL(38,0))"
    inv = "0." + "0" * (scale - 1) + "1" if scale > 0 else "1"
    return (
        f"(({hi} * {_M} + {lo}) "
        f"* CAST({inv} AS DECIMAL({max(scale, 1)},{scale})))"
    )
