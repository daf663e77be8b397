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

from ..exact import sum_pinned, sum_pinned_sql
from ..io import load
from ..registry import query


def sum_revenue():
    """Order-free exact revenue SUM — the q9 pattern, limb-summed.

    ``l_extendedprice`` is on a 2-dp grid and ``(1 - l_discount)`` on a
    2-dp grid, so the product lies exactly on the 1e-4 grid; the double
    product's error (~1e-11) is far from any 1e-4 midpoint, so the
    per-row pin rounds identically in Spark and DuckDB, and the
    integer-limb SUM (exact.py) is associative — the aggregate is
    order-free and bit-identical cross-engine (ROUND-on-double-SUM was
    the flake class: Spark shortest-repr HALF_UP vs DuckDB
    scaled-binary round diverge at .5 boundaries, and a 4-dp-grid sum
    hits a 2-dp .5 boundary ~1/100 groups). Same exact value as
    ``SUM(CAST(.. AS DECIMAL(18,4)))`` — the oracle form — but with
    primitive long aggregation buffers (the decimal-sum form measured
    ~6× slower; see exact.py).
    """
    return F.expr(
        sum_pinned_sql("l_extendedprice * (1 - l_discount)", 4)
    )


#: the same expression for oracle SQL (prefix table alias per query).
REV_DEC_SQL = "CAST({l}l_extendedprice * (1 - {l}l_discount) AS DECIMAL(18,4))"


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
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                                           AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           floor(AVG(l_quantity) * 1000000 + 0.5)/1000000 AS avg_qty,
           floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) * 1000000 + 0.5)/1000000 AS avg_price,
           floor(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) * 1000000 + 0.5)/1000000 AS avg_disc,
           COUNT(*)                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    # Determinism: every float SUM/AVG is fixed-pointed per row to the
    # column's exact decimal grid and limb-summed exactly (exact.py:
    # associative → order-free, identical cross-engine, primitive
    # buffers), then emitted as double; the avg divisions are single
    # IEEE ops on identical operands. Only l_quantity (integer-valued
    # → exact double sum) keeps plain SUM.
    li = load(spark, sf_dir, "lineitem")
    # limb sums as SQL text (one py4j call each — r7 plan-build
    # profile); identical trees dedupe in the physical aggregation,
    # so sum_price appearing twice still aggregates once
    sum_price = F.expr(sum_pinned_sql("l_extendedprice", 2))
    sum_disc = F.expr(sum_pinned_sql("l_discount", 2))
    sum_charge = F.expr(
        sum_pinned_sql(
            "l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6
        )
    )
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            sum_price.cast("double").alias("sum_base_price"),
            sum_revenue().cast("double").alias("sum_disc_price"),
            sum_charge.cast("double").alias("sum_charge"),
            (
                F.floor(F.avg("l_quantity") * 1_000_000 + 0.5) / 1_000_000
            ).alias("avg_qty"),
            (
                F.floor(
                    sum_price.cast("double") / F.count("*") * 1_000_000
                    + 0.5
                )
                / 1_000_000
            ).alias("avg_price"),
            (
                F.floor(
                    sum_disc.cast("double") / F.count("*") * 1_000_000
                    + 0.5
                )
                / 1_000_000
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: three-way join, filtered fact agg, global
    top-10 by revenue.

    customer scales with SF (150k rows *per* SF → 10^8+ at 100 TB), so
    it carries no static broadcast hint: AQE converts the join to
    broadcast at runtime when the filtered side is actually small, and
    falls back to a shuffle join when it isn't. orders↔lineitem is the
    fact join (shuffle on orderkey); the final top-10 plans as
    TakeOrderedAndProject (per-task heaps, driver merges k·tasks —
    never a global sort). Tie-break on l_orderkey keeps the limit
    deterministic.
    """
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15"
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum_revenue().cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q6_revenue_change",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue_delta,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_change(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero joins.

    Every predicate is sargable and reaches the parquet scan
    (PushedFilters); the aggregate is a single partial+final pair, so
    at 100 TB this query is exactly one pass over the pruned columns —
    the canonical 'the optimizer does everything' query.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        sum_pinned(F.col("l_extendedprice") * F.col("l_discount"), 4)
        .cast("double")
        .alias("revenue_delta"),
        F.count("*").alias("n"),
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS correlated subquery → left-semi join.

    The DataFrame form IS the decorrelated plan Catalyst would rewrite
    the subquery into: a left-semi join on the equi key plus the
    non-equi ship-after-order residual. Semi-join output carries only
    orders columns, so the shuffle never materializes matching
    lineitem rows — at 100 TB the fact side streams through the join
    without amplification.
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q5_local_supplier",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: six-way join, revenue by nation.

    Join order: the fact chain (orders→lineitem) shuffles on orderkey
    once. Only nation (25 rows) and region (5 rows) are statically
    broadcast — they are fixed-size at any SF. customer and supplier
    scale with SF (150k / 10k rows per SF), so they carry no hint: AQE
    converts those joins to broadcast at runtime when the side is
    genuinely small and shuffles otherwise. The region filter still
    prunes nation at the broadcast build.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(sum_revenue().cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity threshold).

    The DataFrame form is the decorrelated plan: the per-part average
    is a window over the brand-filtered fact partitioned by partkey —
    ONE scan and one shuffle on l_partkey (the earlier agg +
    join-back formulation scanned and semi-joined the brand-filtered
    fact twice; same rewrite as q2's window-min). At 100 TB the
    window's partition key is the high-cardinality partkey, so no
    global sort appears. part scales with SF (200k parts per SF) so
    the semi join carries no static broadcast hint — AQE decides at
    runtime; restricting the fact to the brand's parts first keeps
    the window input small when the brand is selective.
    """
    from pyspark.sql import Window

    p = load(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#13"
    ).select("p_partkey")
    li = load(spark, sf_dir, "lineitem")
    # threshold only needed for the brand's parts: semi-join first
    li_brand = li.join(p, li.l_partkey == p.p_partkey, "left_semi")
    w = Window.partitionBy("l_partkey")
    return (
        li_brand.withColumn(
            "qty_limit", F.avg("l_quantity").over(w) * 0.2
        )
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            F.round(
                sum_pinned(F.col("l_extendedprice"), 2).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly"),
            F.count("*").alias("n"),
        )
    )
