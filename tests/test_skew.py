"""Salted-join correctness: identical results to the plain join, with
the shuffle key widened to (key, salt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_tools_spark.operators.skew import salted_join


def test_salted_join_matches_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")

    plain = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select("o_orderkey", "c_custkey", "c_mktsegment")
    salted = salted_join(
        orders, customer, "o_custkey", "c_custkey", n_salts=8
    ).select("o_orderkey", "c_custkey", "c_mktsegment")

    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_left_keeps_unmatched(spark, sf_dir):
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    # nation ids only go to 24 -> customers with nationkey >= 12 vs dim<12
    dim = spark.read.parquet(f"{sf_dir}/nation.parquet").filter(
        F.col("n_nationkey") < 12
    )
    plain = customer.join(
        dim, customer.c_nationkey == dim.n_nationkey, "left"
    ).select("c_custkey", "n_name")
    salted = salted_join(
        customer, dim, "c_nationkey", "n_nationkey", n_salts=4, how="left"
    ).select("c_custkey", "n_name")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
