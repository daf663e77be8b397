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


def test_aqe_splits_skewed_join_partitions(spark, tmp_path):
    """AQE skew-join: with one hot key dominating the left side,
    adaptive execution splits the oversized shuffle partition into
    multiple tasks (the runtime complement to salted_join's static
    salting). Asserted from the final adaptive plan's skew flag."""
    import pyspark.sql.functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
        )
    }
    try:
        # force a sort-merge join and make the hot partition "huge"
        # relative to tiny thresholds so the detector fires at test scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "256KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB"
        )
        # the aggregate above the join means the skew split would add a
        # shuffle; force it so the optimization applies anyway (the
        # trade AQE makes automatically when the join is the last stage)
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        # incompressible payload that survives column pruning: the skew
        # detector sees POST-compression map-output sizes, so a constant
        # key with no payload RLE-compresses below any threshold
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(7))
            .otherwise(F.col("id"))
            .alias("k"),
            F.md5(F.col("id").cast("string").cast("binary")).alias("pay"),
        )
        right = spark.range(0, 5_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        df = left.join(right, "k").agg(
            F.count("*").alias("n"), F.sum(F.length("pay")).alias("s")
        )
        (row,) = df.collect()
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in p.lower(), p[:2000]
        # correctness unaffected by the split:
        # k=7: 200k left rows x 1 right match; odd k<5000: 2500 matches
        assert row["n"] == 200_000 + 2_500
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_salted_join_rejects_bad_salt_count_and_survives_salt_column(spark):
    import pytest

    from hadoop_tools_spark.operators.skew import salted_join

    with pytest.raises(ValueError, match="n_salts"):
        salted_join(
            spark.range(2).select(F.col("id").alias("k")),
            spark.range(2).select(F.col("id").alias("k2")),
            "k",
            "k2",
            n_salts=0,
        )
    # a user column named _salt must survive the join untouched
    big = spark.range(4).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("_salt")
    )
    small = spark.range(4).select(F.col("id").alias("k2"))
    out = salted_join(big, small, "k", "k2", n_salts=4)
    rows = {(r.k, r._salt) for r in out.collect()}
    assert rows == {(i, i * 10) for i in range(4)}


def test_write_bucketed_cleans_qualified_table_orphan(spark, tmp_path):
    """Orphan cleanup must find the managed location of a db-qualified
    table (<warehouse>/<db>.db/<table>), not '<warehouse>/<db>.<table>'."""
    import os

    from hadoop_tools_spark.sources.bucketing import write_bucketed

    spark.sql("CREATE DATABASE IF NOT EXISTS hts_bkt_db")
    try:
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        orphan = os.path.join(wh, "hts_bkt_db.db", "torphan")
        os.makedirs(orphan, exist_ok=True)
        open(os.path.join(orphan, "junk"), "w").write("x")
        df = spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        write_bucketed(df, "hts_bkt_db.torphan", "k", n_buckets=2)
        assert spark.table("hts_bkt_db.torphan").count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS hts_bkt_db.torphan")
        spark.sql("DROP DATABASE IF EXISTS hts_bkt_db CASCADE")


import pytest


@pytest.mark.slow
def test_aqe_skew_split_engages_on_hot_key(spark, tmp_path):
    """r7 verdict ask #4 plan assertion, self-contained: a zipfian fact
    ⋈ dim sort-merge join with the AQE byte thresholds scaled to the
    fixture must show skew handling in the FINAL adaptive plan
    (AQEShuffleRead skewed / skew=true), and the split must not change
    the result. Also pins the two traps the probe hit: the inspected
    DataFrame must be the executed one, and the join must be
    SMJ(Sort(shuffle), Sort(shuffle)) directly."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), os.pardir, "tools")
    )
    from rehearse_skew import AQE_PROBE_CONFS

    from pyspark.sql import functions as F

    n, keys = 400_000, 400
    # ~30% of rows on one hot key, the rest uniform
    fact = spark.range(n).selectExpr(
        f"CASE WHEN id % 10 < 3 THEN 7 ELSE id % {keys} END AS k",
        "CAST(id AS DOUBLE) / 100 AS v",
    )
    dim = spark.range(keys).selectExpr("id AS k", "id * 2 AS w")
    fact.write.parquet(str(tmp_path / "fact.parquet"))
    dim.write.parquet(str(tmp_path / "dim.parquet"))

    old = {}
    for k, v in AQE_PROBE_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        f = spark.read.parquet(str(tmp_path / "fact.parquet"))
        d = spark.read.parquet(str(tmp_path / "dim.parquet"))
        res = f.join(d.hint("merge"), "k").agg(
            F.count("*").alias("n"), F.sum("v").alias("s"),
            F.sum("w").alias("t"),
        )
        row = res.collect()[0]
        plan = res._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert "isFinalPlan=true" in plan
    assert plan.count("skew=true") + plan.count("AQEShuffleRead skewed") >= 1, plan
    assert row.n == n  # the split replicated the dim side losslessly
