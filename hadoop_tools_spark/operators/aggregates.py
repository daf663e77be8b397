"""Aggregation family (SURVEY.md §2.B).

All are groupBy().agg() over built-ins, so Spark plans partial
(map-side) + final hash aggregation automatically — the shuffle
carries only group keys × partial states, which is what makes these
O(groups) not O(rows) at 100 TB. Float aggregates are rounded to pin
the oracle hash (sum-of-doubles is order-sensitive in the last ulps).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "agg_basic",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price,
           ROUND(AVG(o_totalprice), 6) AS avg_price,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_basic(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark, sf_dir):
    """Exact distinct counts — planned as expand + two-phase agg."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@query("agg_approx_distinct")  # rows-only: HLL sketches differ across engines
def agg_approx_distinct(spark, sf_dir):
    """HLL approximate distinct — the 100 TB path for cardinality.

    Sketch values are engine-specific, so this key ships without an
    oracle; the exact twin (`agg_distinct`) carries correctness and
    ``tests/test_approx.py`` bounds the relative error vs exact.
    """
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.02).alias("n_parts_approx"))
    )


@query("agg_approx_median")  # rows-only: sketch values are engine-specific
def agg_approx_median(spark, sf_dir):
    """Sketch-based percentile — the 100 TB twin of ``agg_median``.

    Exact percentile buffers every value per group; the
    ``percentile_approx`` sketch is constant-size and mergeable, so
    the shuffle carries sketches, not values. Accuracy parameter 1000
    ⇒ rank error ≤ ~0.1%. The exact twin carries the oracle;
    tests/test_approx.py bounds this key's deviation against it.
    """
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias(
                "median_approx"
            ),
            F.percentile_approx("l_extendedprice", 0.9, 1000).alias(
                "p90_approx"
            ),
        )
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 6)  AS std_qty,
           ROUND(VAR_SAMP(l_quantity), 6)     AS var_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "covar_qty_price"
            ),
        )
    )


@query(
    "agg_median",
    oracle="""
    SELECT l_returnflag,
           ROUND(MEDIAN(l_extendedprice), 4) AS median_price,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_median(spark, sf_dir):
    """Exact median / continuous quantile (interpolating, both engines).

    ``percentile_approx`` is the sketch-based scale path; like the HLL
    key it cannot hash-match another engine, so the declared key uses
    the exact forms and the approx variant is bounded in tests.

    Exact percentile buffers every value, so the two needed columns
    are projected BEFORE the parallelizing repartition — the spread
    shuffle carries 2 columns, not 16 (the general rule for any
    full-buffering aggregate: cut width before the exchange).
    """
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .repartition(spark.sparkContext.defaultParallelism)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.median("l_extendedprice"), 4).alias("median_price"),
            F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias(
                "p90_price"
            ),
        )
    )


@query(
    "agg_mode",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS BIGINT)
    ),
    c2 AS (
      SELECT l_returnflag, q, n,
             SUM(n) OVER (PARTITION BY l_returnflag) AS tot,
             SUM(n) OVER (PARTITION BY l_returnflag ORDER BY q
                          ROWS UNBOUNDED PRECEDING) AS cum,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, q) AS rn
      FROM c
    )
    SELECT l_returnflag,
           MIN(CASE WHEN rn = 1 THEN q END) AS mode_qty,
           CAST(MIN(CASE WHEN rn = 1 THEN n END) AS BIGINT) AS mode_n,
           MIN(CASE WHEN 2 * cum >= tot THEN q END) AS p50_disc_qty,
           MIN(CASE WHEN 4 * cum >= 3 * tot THEN q END) AS p75_disc_qty
    FROM c2 GROUP BY l_returnflag
    """,
)
def agg_mode(spark, sf_dir):
    """Exact mode and discrete percentiles per group, with fully
    pinned tie semantics: the mode is the SMALLEST value among those
    with maximal frequency (engine-native ``mode()`` functions pick an
    arbitrary tie winner, which can never hash-match across engines),
    and percentile_disc(q) is the smallest value whose cumulative
    frequency reaches q — expressed identically in both engines
    instead of trusting two implementations' boundary conventions.

    Scale shape: one map-side-combinable groupBy on (group, value) —
    the only pass over the fact table — then windows and the final
    rollup all run on the value-histogram, whose size is
    |groups| x |distinct values|, independent of row count. This is
    the histogram-first pattern for any exact order statistic over a
    low-cardinality value domain.
    """
    c = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag", F.col("l_quantity").cast("long").alias("q")
        )
        .groupBy("l_returnflag", "q")
        .agg(F.count("*").alias("n"))
    )
    wp = Window.partitionBy("l_returnflag")
    c2 = c.select(
        "l_returnflag",
        "q",
        "n",
        F.sum("n").over(wp).alias("tot"),
        F.sum("n")
        .over(wp.orderBy("q").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.row_number()
        .over(wp.orderBy(F.col("n").desc(), F.col("q")))
        .alias("rn"),
    )
    return c2.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("rn") == 1, F.col("q"))).alias("mode_qty"),
        F.min(F.when(F.col("rn") == 1, F.col("n"))).alias("mode_n"),
        F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("q"))).alias(
            "p50_disc_qty"
        ),
        F.min(
            F.when(4 * F.col("cum") >= 3 * F.col("tot"), F.col("q"))
        ).alias("p75_disc_qty"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT o_orderstatus,
           ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderpriority)), ',')
               AS priorities
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_collect(spark, sf_dir):
    """collect_set → sorted → joined to a string (type-stable hash)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), ","
            ).alias("priorities")
        )
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark, sf_dir):
    """Hierarchical subtotals — planned as a single Expand + agg."""
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           ROUND(AVG(c_acctbal), 6) AS avg_bal
    FROM customer
    GROUP BY CUBE (c_mktsegment, c_nationkey)
    """,
)
def agg_cube(spark, sf_dir):
    return (
        load(spark, sf_dir, "customer")
        .cube("c_mktsegment", "c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_bal"),
        )
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
           CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot with pinned value list (no extra pass to discover values).

    Missing combinations become 0 on both sides (``na.fill`` here,
    COUNT CASE there) so nullable-int pandas dtype drift can't break
    the hash.
    """
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


@query(
    "agg_unpivot",
    oracle="""
    SELECT o_orderpriority, measure, ROUND(val, 2) AS val
    FROM (
      SELECT o_orderpriority,
             ROUND(SUM(o_totalprice), 2) AS total_price,
             ROUND(AVG(o_totalprice), 2) AS avg_price,
             ROUND(MAX(o_totalprice), 2) AS max_price
      FROM orders GROUP BY o_orderpriority
    )
    UNPIVOT (val FOR measure IN (total_price, avg_price, max_price))
    """,
)
def agg_unpivot(spark, sf_dir):
    """UNPIVOT (melt): wide per-group measures into long
    (group, measure, value) rows — the inverse of `agg_pivot`.

    The unpivot runs AFTER aggregation, so the 3x row expansion
    applies to group-level rows only (tiny); melting raw fact rows
    would triple the shuffle volume instead. Expand-based, stays in
    codegen, no extra exchange.
    """
    wide = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["total_price", "avg_price", "max_price"],
        variableColumnName="measure",
        valueColumnName="val",
    ).select("o_orderpriority", "measure", F.round("val", 2).alias("val"))


@query(
    "agg_heavy_hitters",
    oracle="""
    WITH c AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey
    ), n AS (SELECT COUNT(*) AS total FROM lineitem)
    SELECT l_partkey, cnt,
           ROUND(cnt * 10000.0 / (SELECT total FROM n), 4) AS per_10k
    FROM c WHERE cnt * 1250 >= (SELECT total FROM n)
    """,
)
def agg_heavy_hitters(spark, sf_dir):
    """Exact frequent-item detection: part keys covering >= 0.08% of
    lineitem (tuned to the fixture's near-uniform key distribution so
    every SF yields a non-trivial answer set), with per-10k share.

    Scan + map-side-combined count + a 1-row total broadcast: the
    exact anchor for frequency estimation. The bounded-memory twin for
    cardinalities where even the counting groupBy is too wide is
    Misra-Gries (test_analytics.py proves a k-summary mapInPandas
    merge finds every true heavy hitter on this fixture) — sketch
    summaries merge associatively, so re-aggregation stays O(k) per
    partition at any scale.
    """
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    total = li.count()
    counts = li.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    return counts.filter(F.col("cnt") * 1250 >= total).select(
        "l_partkey",
        "cnt",
        F.round(F.col("cnt") * 10000.0 / total, 4).alias("per_10k"),
    )


@query(
    "agg_linreg",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           ROUND(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_x,
           ROUND(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_y
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_linreg(spark, sf_dir):
    """SQL:2003 linear-regression aggregates (regr_*): price-vs-
    quantity fit per return flag. Single-pass mergeable moment
    statistics (the same partial-aggregate algebra as var/covar), so
    map-side combine works and the exchange moves 6 doubles per
    group — regression over 100 TB is one scan."""
    li = load(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).cast("long").alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 4).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 4).alias("avg_y"),
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def agg_listagg(spark, sf_dir):
    """Ordered string aggregation (SQL:2016 LISTAGG, new in Spark 4):
    comma-joined nation list per region, deterministic via WITHIN
    GROUP ordering. Ordered aggregates buffer per group — bounded
    here by design (group members are a dimension); for unbounded
    groups the scale answer is collect -> sort -> slice with an
    explicit cap, never an unordered concat (retry-unstable)."""
    load(spark, sf_dir, "region").createOrReplaceTempView("_la_region")
    load(spark, sf_dir, "nation").createOrReplaceTempView("_la_nation")
    return spark.sql(
        """
        SELECT r.r_name,
               listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
                   AS nations,
               COUNT(*) AS n_nations
        FROM _la_region r JOIN _la_nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )


@query(
    "agg_boolean",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (o_totalprice > 100000) AS BIGINT)
             AS n_big,
           BOOL_AND(o_totalprice > 900) AS all_over_900,
           BOOL_OR(o_orderstatus = 'F') AS any_finished,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_key
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_boolean(spark, sf_dir):
    """Boolean/conditional aggregate family: count_if, every (bool_and),
    some (bool_or), and a DETERMINISTIC any_value stand-in. All four
    are map-side combinable single-bit or single-value states — the
    cheapest aggregates there are; `any_value` itself is
    intentionally avoided in favor of min(): "any" is
    partition-order-dependent and therefore retry-unstable, the same
    reason unordered concat is banned from the LISTAGG key.
    """
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.every(F.col("o_totalprice") > 900).alias("all_over_900"),
        F.some(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.min("o_orderkey").alias("first_key"),
    )


@query("agg_sketch_hll_merge")  # rows-only: DataSketches binary has no DuckDB twin
def agg_sketch_hll_merge(spark, sf_dir):
    """Mergeable HLL sketches (Apache DataSketches, Spark 4 built-in):
    per-nation customer sketches unioned up to region level, estimates
    next to exact ground truth.

    This is the re-aggregatable-rollup pattern a 100 TB cube needs:
    the nation-level sketch is a few KB of mergeable state, so the
    region (or global) NDV re-aggregates from stored partials by
    sketch union — no second pass over raw data, unlike
    COUNT(DISTINCT) which cannot compose from per-group results.
    HLL register updates are max-merges, so the estimate is
    order/partitioning-independent — but the sketch encoding is
    engine-specific, hence rows-only; the accuracy contract
    (|est − exact| ≤ 5 %) is pinned in pytest instead.
    """
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    per_nation = (
        c.groupBy(F.col("c_nationkey"))
        .agg(
            F.hll_sketch_agg("c_custkey", F.lit(12)).alias("sk"),
            F.countDistinct("c_custkey").alias("exact_nd"),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        per_nation.groupBy(F.col("n_regionkey").alias("region_key"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("long")
            .alias("est_ndv"),
            # custkeys are globally unique, so nation exacts sum to the
            # region exact — the ground truth rides the same rollup
            F.sum("exact_nd").alias("exact_ndv"),
        )
        .select("region_key", "est_ndv", "exact_ndv")
    )


@query(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_id(spark, sf_dir):
    """CUBE with ``grouping_id()``/``grouping()`` — the bitmask that
    tells a consumer WHICH aggregation level each output row belongs
    to (0 = detail, 3 = grand total), so one cube pass can feed
    level-specific downstream logic without re-aggregating. The oracle
    composes the id from GROUPING() bits explicitly
    (g(status)·2 + g(priority)), pinning the bit order against
    engine-convention drift. Single Expand + partial agg, same shape
    as agg_cube.
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            F.col("gid").cast("long").alias("gid"),
            "g_status",
            "n_orders",
            "sum_price",
        )
    )


@query(
    "agg_argminmax",
    oracle="""
    SELECT o_orderpriority,
           CAST(MIN_BY(o_orderkey,
                       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       * 10000000 + o_orderkey) AS BIGINT)
               AS cheapest_order,
           CAST(MAX_BY(o_orderkey,
                       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       * 10000000 + o_orderkey) AS BIGINT)
               AS priciest_order,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_argminmax(spark, sf_dir):
    """argmin/argmax aggregates (``min_by``/``max_by``): the order id
    carrying each priority's extreme price — one pass, no join-back
    and no per-group sort, the single-shuffle alternative to the
    window-rank idiom when only the extreme row's key is needed.

    Determinism: price ties would make bare min_by engine-arbitrary,
    so the ordering key is the integer composite cents·10⁷ + orderkey
    — a total order (exact cents, orderkey < 10⁷ at every fixture SF)
    encoded identically on both engines, since DuckDB's min_by cannot
    order by a struct.
    """
    o = load(spark, sf_dir, "orders")
    ordkey = (
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long") * 10_000_000
        + F.col("o_orderkey")
    )
    return o.groupBy("o_orderpriority").agg(
        F.min_by("o_orderkey", ordkey).cast("long").alias("cheapest_order"),
        F.max_by("o_orderkey", ordkey).cast("long").alias("priciest_order"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "agg_moments",
    oracle="""
    WITH c AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
        FROM events
    ),
    m AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s1,
               CAST(SUM(x * x) AS BIGINT) AS s2,
               CAST(SUM(CAST(x AS HUGEINT) * x * x) AS HUGEINT) AS s3,
               CAST(SUM(CAST(x AS HUGEINT) * x * x * x) AS HUGEINT) AS s4
        FROM c GROUP BY event_type
    )
    SELECT event_type, n,
           floor((CAST(s2 AS DOUBLE) / n
                  - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                 * 10000 + 0.5) / 10000 AS var_pop4,
           floor((CAST(s3 AS DOUBLE) / n
                  - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                  + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n))
                 / pow(CAST(s2 AS DOUBLE) / n
                       - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
                       1.5)
                 * 1000000 + 0.5) / 1000000 AS skewness6,
           floor((CAST(s4 AS DOUBLE) / n
                  - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
                  + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s2 AS DOUBLE) / n)
                  - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                 / ((CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                    * (CAST(s2 AS DOUBLE) / n
                       - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
                 * 1000000 + 0.5) / 1000000 AS kurtosis6
    FROM m
    """,
)
def agg_moments(spark, sf_dir):
    """Population skewness and kurtosis per event type from EXACT raw
    moment sums — higher-order distribution shape beyond
    ``agg_stats``'s variance/correlation.

    Raw moments Σx..Σx⁴ accumulate as integers over cents (x ≤ 10⁴
    cents ⇒ x⁴ ≤ 10¹⁶; partial sums stay in range at fixture scales
    and the reduction is order-independent — unlike merged
    central-moment streams, whose last-ulp depends on partition
    order). The central-moment identities then run in float once per
    GROUP (not per row), a fixed IEEE expression both engines
    evaluate identically; outputs are floor-pinned. Map-side
    combinable like any sum — the single-pass mergeable-moments
    pattern (same family as agg_linreg).
    """
    ev = load(spark, sf_dir, "events")
    c = ev.select(
        "event_type", F.floor(F.col("value") * 100 + 0.5).cast("long").alias("x")
    )
    m = c.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        # widen BEFORE multiplying: cents^4 for a 560.21 value is
        # 9.85e18 > int64 max — the sf0.1 bench caught the per-row
        # overflow that sf0.01's smaller maxima never hit
        F.sum(
            F.col("x").cast("decimal(38,0)") * F.col("x") * F.col("x")
        ).alias("s3"),
        F.sum(
            F.col("x").cast("decimal(38,0)")
            * F.col("x")
            * F.col("x")
            * F.col("x")
        ).alias("s4"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n") - mu * mu
    m3 = (
        F.col("s3").cast("double") / F.col("n")
        - 3 * mu * (F.col("s2").cast("double") / F.col("n"))
        + 2 * mu * mu * mu
    )
    m4 = (
        F.col("s4").cast("double") / F.col("n")
        - 4 * mu * (F.col("s3").cast("double") / F.col("n"))
        + 6 * mu * mu * (F.col("s2").cast("double") / F.col("n"))
        - 3 * mu * mu * mu * mu
    )
    return m.select(
        "event_type",
        "n",
        (F.floor(m2 * 10_000 + 0.5) / 10_000).alias("var_pop4"),
        (F.floor(m3 / F.pow(m2, 1.5) * 1_000_000 + 0.5) / 1_000_000).alias(
            "skewness6"
        ),
        (F.floor(m4 / (m2 * m2) * 1_000_000 + 0.5) / 1_000_000).alias(
            "kurtosis6"
        ),
    )
