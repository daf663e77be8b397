"""Modern SQL-surface operators (SURVEY.md §2.G): recursive CTEs and
correlated LATERAL joins — the two SQL:2016 features users most often
find missing from engines, both supported natively by Spark 4.1.

Both keys run through ``spark.sql`` over temp views of the fixture
tables, so they exercise the engine's SQL front-end (parser →
analyzer → same Catalyst pipeline as the DataFrame keys).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..exact import sum_pinned_sql
from ..io import load
from ..registry import query

#: limb-summed exact revenue fragments (see exact.py): same value as
#: SUM(CAST(expr AS DECIMAL(18,4))) with primitive long agg buffers.
_SUM_PRICE_4 = sum_pinned_sql("o_totalprice", 4)


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT DATE '1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < DATE '2001-08-01'
    )
    SELECT CAST(m AS VARCHAR) AS month_start,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 0)
                AS DOUBLE) AS revenue
    FROM months LEFT JOIN orders
      ON date_trunc('month', o_orderdate) = m
    GROUP BY m
    """,
)
def sql_recursive_cte(spark, sf_dir):
    """Calendar-spine generation via WITH RECURSIVE + spine-preserving
    left join: every month 1995-01..2001-08 (the fixture's full span) appears exactly once, with
    zero-revenue months kept — the canonical gap-filling rollup that
    plain GROUP BY cannot express.

    The recursion is linear (one row per step, 80 steps) so the
    iterative union runs driver-light and the real work stays in the
    left join, where the 80-row spine broadcasts against the fact
    scan. Oracle runs DuckDB's recursive CTE with its own interval
    dialect — same semantics, independently derived.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("_rc_orders")
    return spark.sql(
        f"""
        WITH RECURSIVE months(m) AS (
          SELECT DATE '1995-01-01'
          UNION ALL
          SELECT add_months(m, 1) FROM months
          WHERE m < DATE '2001-08-01'
        )
        SELECT CAST(m AS STRING) AS month_start,
               CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
               CAST(COALESCE({_SUM_PRICE_4}, 0)
                AS DOUBLE) AS revenue
        FROM months LEFT JOIN _rc_orders
          ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
        GROUP BY m
        """
    )


@query(
    "join_lateral",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             LIMIT 2) t
    """,
)
def join_lateral(spark, sf_dir):
    """Correlated LATERAL top-N: each customer's two most expensive
    orders via a per-row subquery — the SQL spelling of `topk_group`.

    Catalyst decorrelates the lateral subquery into a ranked window
    over a single orders shuffle (no nested-loop re-execution per
    customer), which is exactly the plan the DataFrame twin
    (`topk_group`) declares by hand — the two keys pin both spellings
    to the same scalable shape. Unique tie-breaker (o_orderkey) keeps
    the LIMIT deterministic for the oracle hash.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM _lat_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM _lat_orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 LIMIT 2) t
        """
    )


@query(
    "sql_udf",
    oracle="""
    SELECT l_returnflag,
           CASE WHEN l_extendedprice > 50000 THEN 'hi' ELSE 'lo' END AS band,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS disc_revenue
    FROM lineitem
    GROUP BY l_returnflag,
             CASE WHEN l_extendedprice > 50000 THEN 'hi' ELSE 'lo' END
    """,
)
def sql_udf(spark, sf_dir):
    """SQL-defined scalar functions (Spark 4 `CREATE FUNCTION ...
    RETURN expr`): business logic named once in the catalog and
    reused across queries — unlike a Python UDF, the body is a SQL
    expression Catalyst INLINES, so it stays in whole-stage codegen
    with zero serialization boundary (the oracle is literally the
    inlined form). The definition travels with the catalog, not the
    application code — the warehouse way to share `disc_price`.
    """
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_udf_lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)"
        " RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)"
        " RETURNS STRING"
        " RETURN CASE WHEN p > 50000 THEN 'hi' ELSE 'lo' END"
    )
    sum_disc = sum_pinned_sql("disc_price(l_extendedprice, l_discount)", 4)
    return spark.sql(
        f"""
        SELECT l_returnflag, price_band(l_extendedprice) AS band,
               COUNT(*) AS n,
               CAST({sum_disc} AS DOUBLE) AS disc_revenue
        FROM _udf_lineitem
        GROUP BY l_returnflag, price_band(l_extendedprice)
        """
    )


@query(
    "sql_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                         FILTER (o_orderstatus = 'F'), 0) AS DOUBLE)
               AS rev_f,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                         FILTER (o_orderstatus = 'O'), 0) AS DOUBLE)
               AS rev_o,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                         FILTER (o_orderstatus = 'P'), 0) AS DOUBLE)
               AS rev_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def sql_pivot(spark, sf_dir):
    """SQL-syntax PIVOT clause (vs ``agg_pivot``'s DataFrame API):
    order counts and revenue per priority, pivoted on the three order
    statuses. The oracle is the semantic definition — conditional
    FILTER aggregates — which is also exactly what Catalyst rewrites
    PIVOT into (one pass, no per-status scans); the explicit IN list
    keeps the output schema static so no driver-side distinct-value
    probe runs at plan time (the 100 TB rule for pivots: always name
    your columns).
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_pivot_src")
    # the PIVOT aggregates must be plain column aggs, so the limb
    # decomposition (exact.py) happens in the subquery: pivot SUMs the
    # two primitive limb columns, the outer SELECT recombines them in
    # DECIMAL once per group — same exact value as SUM(DECIMAL(18,4)),
    # primitive long buffers in the pivot itself.
    rec = (
        "CAST(COALESCE((CAST({p}_rhi AS DECIMAL(38,0)) * 2097152"
        " + {p}_rlo) * CAST(0.0001 AS DECIMAL(4,4)), 0) AS DOUBLE)"
    )
    return spark.sql(
        f"""
        SELECT o_orderpriority,
               COALESCE(F_n, 0)  AS n_f,
               COALESCE(O_n, 0)  AS n_o,
               COALESCE(P_n, 0)  AS n_p,
               {rec.format(p='F')} AS rev_f,
               {rec.format(p='O')} AS rev_o,
               {rec.format(p='P')} AS rev_p
        FROM (
            SELECT o_orderpriority, o_orderstatus,
                   PMOD(CAST(FLOOR(o_totalprice * 10000 + 0.5) AS BIGINT),
                        2097152) AS u_lo,
                   SHIFTRIGHT(CAST(FLOOR(o_totalprice * 10000 + 0.5)
                                   AS BIGINT), 21) AS u_hi
            FROM orders_pivot_src
        )
        PIVOT (
            COUNT(*) AS n, SUM(u_lo) AS rlo, SUM(u_hi) AS rhi
            FOR o_orderstatus IN ('F', 'O', 'P')
        )
        """
    )


@query(
    "sql_params",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
    FROM orders
    WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def sql_params(spark, sf_dir):
    """Parameterized SQL (Spark 4 named-parameter binding): the query
    text carries ``:threshold`` / ``:status`` placeholders and values
    bind server-side — no string interpolation, so a hostile value
    cannot change the query shape (the SQL-injection-safe pattern for
    templated analytics at any scale) and plan caching keys on the
    constant template.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_param_src")
    return spark.sql(
        f"""
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST({_SUM_PRICE_4} AS DOUBLE)
               AS revenue
        FROM orders_param_src
        WHERE o_totalprice > :threshold AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"threshold": 150000.0, "status": "O"},
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 0
    """,
)
def sql_pipe_syntax(spark, sf_dir):
    """SQL pipe syntax (Spark 4's `|>` operators, the GoogleSQL
    pipe-query surface): the same logical plan as the classic
    SELECT, written as a top-to-bottom dataflow — scan |> filter |>
    aggregate — which is the form query generators and teaching
    tools emit. Catalyst parses pipes into the identical plan (the
    oracle is the classic spelling), so this key pins that the
    surface is wired, not that a new engine path exists.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("_pipe_orders")
    return spark.sql(
        """
        FROM _pipe_orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                          AS DOUBLE) AS revenue
           GROUP BY o_orderpriority
        |> WHERE n_orders > 0
        |> SELECT o_orderpriority, n_orders, revenue
        """
    )


@query(
    "fn_collation",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % 2 = 0 THEN lower(o_orderstatus)
                  ELSE o_orderstatus END AS s
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT s) AS BIGINT) AS n_binary,
           CAST(COUNT(DISTINCT lower(s)) AS BIGINT) AS n_lcase
    FROM m GROUP BY o_orderpriority
    """,
)
def fn_collation(spark, sf_dir):
    """Collation-aware comparison (Spark 4 `COLLATE UTF8_LCASE`):
    distinct-counts over a deliberately case-mixed column under the
    binary collation vs the case-insensitive one — the surface a
    catalog needs before collated columns can ORDER/GROUP/JOIN
    without wrapping every reference in lower() (which would defeat
    pushdown and dictionary reuse on a real table). The oracle pins
    the lcase count with explicit lower() — collation semantics
    reduced to an engine-neutral form.

    ASCII-only assumption (ADVICE r10): UTF8_LCASE applies full
    Unicode case folding, lower() only simple case mapping — they
    coincide exactly on ASCII, so the oracle equivalence is pinned
    to this key's column (o_orderstatus: single ASCII status chars
    by TPC-H spec). Do NOT repoint the key at a free-text column
    (ß→ss, İ→i̇ and friends would split the counts).

    Scale note: collated distincts aggregate exactly like binary
    ones (hash on the collation key); UTF8_LCASE keys hash their
    case-folded form, so no re-shuffle vs the lower() spelling.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("_coll_orders")
    return spark.sql(
        """
        WITH m AS (
          SELECT o_orderpriority,
                 CASE WHEN o_orderkey % 2 = 0 THEN lower(o_orderstatus)
                      ELSE o_orderstatus END AS s
          FROM _coll_orders
        )
        SELECT o_orderpriority,
               CAST(COUNT(DISTINCT s) AS BIGINT) AS n_binary,
               CAST(COUNT(DISTINCT (s COLLATE UTF8_LCASE)) AS BIGINT)
                   AS n_lcase
        FROM m GROUP BY o_orderpriority
        """
    )
