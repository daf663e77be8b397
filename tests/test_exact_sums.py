"""exact.py limb sums: bit-identical to the DECIMAL sums they replace.

The limb decomposition must be EXACT (not approximately equal) — the
whole point is that the driver hash-compares these aggregates against
DuckDB, so every test here asserts `==` on collected values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_tools_spark.exact import sum_exact, sum_pinned, to_units
from hadoop_tools_spark.io import load


def test_to_units_matches_decimal_cast_on_fixture(spark, sf_dir):
    """floor(x*10^s + 0.5) must agree with CAST(x AS DECIMAL(18,s)) on
    every grid-pinned fixture column — including negative c_acctbal."""
    cases = [
        ("lineitem", "l_extendedprice", 2),
        ("lineitem", "l_discount", 2),
        ("lineitem", "l_tax", 2),
        ("orders", "o_totalprice", 4),
        ("customer", "c_acctbal", 2),
        ("events", "value", 2),
    ]
    for table, col, scale in cases:
        df = load(spark, sf_dir, table)
        n_diff = df.filter(
            to_units(F.col(col), scale)
            != (F.col(col).cast(f"decimal(18,{scale})") * 10**scale).cast(
                "long"
            )
        ).count()
        assert n_diff == 0, (table, col, scale)


def test_sum_pinned_bit_equal_to_decimal_sum(spark, sf_dir):
    """Grouped sum_pinned == SUM(CAST(x AS DECIMAL(18,s))) exactly."""
    li = load(spark, sf_dir, "lineitem")
    got = (
        li.groupBy("l_returnflag")
        .agg(
            sum_pinned(F.col("l_extendedprice"), 2)
            .cast("double")
            .alias("fast"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("ref"),
            sum_pinned(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            )
            .cast("double")
            .alias("fast4"),
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("ref4"),
        )
        .collect()
    )
    for r in got:
        assert r.fast == r.ref
        assert r.fast4 == r.ref4


def test_sum_exact_negatives_and_limbs(spark):
    """Limb recombination is exact for negative values and with 3
    limbs; matches a Python big-int sum."""
    vals = [
        (1, 123456789012),
        (1, -987654321098),
        (1, (1 << 52) + 17),
        (1, -(1 << 52) - 13),
        (2, -1),
        (2, 0),
        (2, 41),
    ]
    df = spark.createDataFrame(vals, "g int, u long")
    for limbs in (2, 3):
        rows = (
            df.groupBy("g")
            .agg(sum_exact(F.col("u"), limbs=limbs).alias("s"))
            .collect()
        )
        got = {r.g: int(r.s) for r in rows}
        want = {}
        for g, u in vals:
            want[g] = want.get(g, 0) + u
        assert got == want, limbs


def test_sum_exact_null_semantics(spark):
    """NULL rows are skipped; all-NULL groups yield NULL (plain-SUM
    semantics)."""
    df = spark.createDataFrame(
        [(1, 10), (1, None), (2, None)], "g int, u long"
    )
    rows = {
        r.g: r
        for r in df.groupBy("g")
        .agg(
            sum_exact(F.col("u")).alias("s"),
            F.sum("u").alias("ref"),
        )
        .collect()
    }
    assert int(rows[1].s) == 10 and rows[1].ref == 10
    assert rows[2].s is None and rows[2].ref is None


def test_sum_exact_property_random_longs(spark):
    """Property: sum_exact == Python big-int sum for random longs
    across the full int64 range, at 2 and 3 limbs, per group."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    lo, hi = -(1 << 62), (1 << 62) - 1

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),
                st.integers(min_value=lo, max_value=hi),
            ),
            min_size=1,
            max_size=30,
        )
    )
    def run(rows):
        df = spark.createDataFrame(rows, "g int, u long")
        for limbs in (2, 3):
            got = {
                r.g: int(r.s)
                for r in df.groupBy("g")
                .agg(sum_exact(F.col("u"), limbs=limbs).alias("s"))
                .collect()
            }
            want = {}
            for g, u in rows:
                want[g] = want.get(g, 0) + u
            assert got == want, limbs

    run()


def test_sum_exact_large_per_row_products(spark):
    """limbs=3 stays exact for per-row values near 2^47 (squared-cents
    scale) summed over many rows — the agg_stats sufficient-statistic
    shape."""
    big = (1 << 47) - 3
    df = spark.createDataFrame(
        [(big,)] * 1000 + [(-7,)] * 10, "u long"
    )
    s = df.agg(sum_exact(F.col("u"), limbs=3).alias("s")).collect()[0].s
    assert int(s) == big * 1000 - 70
