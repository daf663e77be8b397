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

def test_salted_join_semi_anti_match_plain(spark, sf_dir):
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    dim = spark.read.parquet(f"{sf_dir}/nation.parquet").filter(
        F.col("n_nationkey") < 12
    )
    for how in ("left_semi", "left_anti"):
        plain = customer.join(
            dim, customer.c_nationkey == dim.n_nationkey, how
        ).select("c_custkey")
        salted = salted_join(
            customer, dim, "c_nationkey", "n_nationkey", n_salts=4, how=how
        ).select("c_custkey")
        assert sorted(r[0] for r in salted.collect()) == sorted(
            r[0] for r in plain.collect()
        ), how


def test_salted_join_rejects_right_and_full_outer(spark, sf_dir):
    import pytest

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(
                customer, nation, "c_nationkey", "n_nationkey", how=how
            )


def test_salted_join_salt_is_content_derived(spark, sf_dir):
    """Salt must be a pure function of row content (stable across
    retries/recomputation) — recomputing the same plan twice yields
    identical salt assignments."""
    from pyspark.sql import functions as F2

    big = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(500)
    salt = F2.pmod(
        F2.xxhash64(*[F2.col(c) for c in big.columns]), F2.lit(8)
    ).cast("int")
    a = big.withColumn("_salt", salt).select("o_orderkey", "_salt").collect()
    b = big.withColumn("_salt", salt).select("o_orderkey", "_salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len({s for _, s in a}) > 1  # actually spreads
