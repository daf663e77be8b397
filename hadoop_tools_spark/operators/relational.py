"""Relational core operators (SURVEY.md §2.B).

Every query here is declarative DataFrame API — scan → filter →
project → join/agg/window — so Catalyst supplies predicate pushdown,
column pruning, partial aggregation, and join-strategy selection, and
AQE re-plans at shuffle boundaries at runtime. Scale notes per
operator are in the docstrings; plan assertions live in
``tests/test_plans.py``.

Determinism discipline (SURVEY.md §5.3): float aggregates rounded,
total orders carry tie-breakers, no engine-specific RNG/hashes in
oracle-checked keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load
from ..registry import query


# --------------------------------------------------------------------------
# Flagship (M1): TPC-H-Q1-style pricing summary.
# Exercises scan → pushed filter → partial+final hash agg → sort.
# Reference analogue: `hh du`-style aggregation over a large record set
# (SURVEY §2.A), generalized to relational form.
# At scale: map-side partial aggregation means the shuffle carries only
# (flag, status) groups — a few dozen rows per partition regardless of
# input size; the l_shipdate predicate reaches the parquet row-group
# filter (PushedFilters), and only 7 of 11 columns are read (ReadSchema).
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)       AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)  AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                                           AS sum_charge,
           ROUND(AVG(l_quantity), 6)       AS avg_qty,
           ROUND(AVG(l_extendedprice), 6)  AS avg_price,
           ROUND(AVG(l_discount), 6)       AS avg_disc,
           COUNT(*)                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
