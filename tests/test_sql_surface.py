"""SQL entry point (SURVEY.md §3.2 P2): the same engine drives from
`spark.sql` over registered views — identical results to the
DataFrame-API operators, same Catalyst pipeline after parsing."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def views(spark):
    from hadoop_tools_spark.io import load_tables

    load_tables(spark, SF_DIR)
    return spark


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_q1_equals_dataframe(views, spark, sf_dir):
    from hadoop_tools_spark.operators.relational import q1_pricing_summary

    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)      AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(AVG(l_discount), 6)      AS avg_disc,
               COUNT(*)                       AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )
    df = q1_pricing_summary(spark, sf_dir).select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "avg_disc",
        "count_order",
    )
    assert rows(sql) == rows(df)


def test_sql_join_equals_dataframe(views, spark, sf_dir):
    from hadoop_tools_spark.operators.joins import join_inner

    sql = spark.sql(
        """
        SELECT o.o_orderkey, c.c_name, n.n_name,
               ROUND(o.o_totalprice, 2) AS total_price
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderstatus = 'F'
        """
    )
    assert rows(sql) == rows(join_inner(spark, sf_dir))


def test_sql_window_equals_dataframe(views, spark, sf_dir):
    from hadoop_tools_spark.operators.windows import topk_group

    sql = spark.sql(
        """
        SELECT o_orderpriority, o_orderkey, total_price, rn FROM (
            SELECT o_orderpriority, o_orderkey,
                   ROUND(o_totalprice, 2) AS total_price,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 3
        """
    )
    assert rows(sql) == rows(topk_group(spark, sf_dir))


def test_lateral_decorrelated_no_cartesian(spark, sf_dir):
    """Catalyst must decorrelate the LATERAL top-N into a windowed
    plan — per-customer subquery re-execution (cartesian/nested-loop)
    would be quadratic at scale."""
    from hadoop_tools_spark.operators.sqlsurface import join_lateral

    df = join_lateral(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "Window" in p or "WindowGroupLimit" in p, p


def test_lateral_equals_topk_group_shape(spark, sf_dir):
    """LATERAL spelling and the DataFrame top-k agree row-for-row."""
    from hadoop_tools_spark.operators.sqlsurface import join_lateral

    got = {
        (r.c_custkey, r.o_orderkey)
        for r in join_lateral(spark, sf_dir).collect()
    }
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    want = {
        (r.o_custkey, r.o_orderkey)
        for r in orders.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 2")
        .collect()
    }
    assert got == want


def test_recursive_cte_spine_complete(spark, sf_dir):
    from hadoop_tools_spark.operators.sqlsurface import sql_recursive_cte

    rows = sql_recursive_cte(spark, sf_dir).collect()
    assert len(rows) == 80  # 1995-01 .. 2001-08 inclusive
    months = sorted(r.month_start for r in rows)
    assert months[0] == "1995-01-01" and months[-1] == "2001-08-01"
    # gap-filling: empty months carry zero revenue, not absence
    assert all(r.revenue >= 0 for r in rows)
    total = sum(r.n_orders for r in rows)
    assert total == spark.read.parquet(f"{sf_dir}/orders.parquet").count()
