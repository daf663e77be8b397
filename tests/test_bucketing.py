"""Bucketed co-located join: correctness + shuffle-free plan."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from hadoop_tools_spark.sources.bucketing import bucketed_pair


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # managed tables land in the session's spark-warehouse dir
    # (static conf — can't be redirected per-test)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        bucketed_pair(
            spark, orders, lineitem, "o_orderkey", "l_orderkey", n_buckets=8
        ),
        orders,
        lineitem,
    )


def test_bucketed_join_has_no_exchange(spark, bucketed):
    (bo, bl), _, _ = bucketed
    # fixture tables fit under the broadcast threshold, which would
    # bypass buckets entirely; disable to witness the co-located SMJ
    # (at 100 TB neither side broadcasts and this is the real plan)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # co-located buckets: no shuffle on either side
        assert "Exchange" not in plan, plan
        # appears in both the AQE initial and final plan renderings
        assert plan.count("Bucketed: true") >= 2, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed):
    (bo, bl), orders, lineitem = bucketed
    want = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    got = (
        bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_join_bucketed_key_plan_is_exchange_free(spark, sf_dir):
    """The registered join_bucketed key must plan the shuffle-free
    co-located SortMergeJoin once broadcast is off the table (at
    fixture scale Catalyst rightly broadcasts the small side — at
    100 TB neither side broadcasts and the bucketed SMJ is the real
    plan): no Exchange anywhere upstream of the join; the only
    exchange in the whole plan is the final aggregate fan-in."""
    from hadoop_tools_spark.operators.joins import join_bucketed

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = join_bucketed(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        # every exchange is the post-join aggregate fan-in (the AQE
        # rendering shows initial+final plans, so it may appear twice)
        # — never a shuffle on a JOIN key: both inputs read buckets
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
        assert plan.count("Exchange hashpartitioning") == plan.count(
            "Exchange hashpartitioning(o_orderpriority"
        ), plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
