"""Data-layout + incremental-maintenance operators (SURVEY.md §2.G).

Two warehouse techniques whose whole point is the 100 TB behavior:

- **Z-order clustering** (`zorder_layout`): interleave the bits of two
  bucketized dimensions into one sort key so a range-partitioned write
  co-locates rows that are close in BOTH dimensions — parquet min/max
  row-group stats then prune multi-dimensional predicates, which a
  single-column sort cannot do. The key computes the z-value
  declaratively (pure codegen arithmetic); test_layout.py writes both
  layouts and measures the bounding-box shrink.

- **Incremental materialized-view maintenance** (`mv_incremental`):
  aggregates maintained as mergeable partials (count/sum/min/max) so a
  new data slice only requires aggregating the delta and merging — the
  classic partial-aggregate contract that makes nightly 100 TB rollups
  an O(delta) job. The key computes old-partition partials and
  delta partials separately, merges them, and must equal the oracle's
  direct full aggregate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import load
from ..registry import query

_ZBITS = 8  # bits per dimension -> 16-bit z-value


def _bucket(col, mn, mx):
    """Scale col into [0, 2^_ZBITS) with closed-form double math
    (identical in Spark and DuckDB: floor((x-mn)*256/(mx-mn+1)))."""
    return F.least(
        F.lit((1 << _ZBITS) - 1),
        F.floor((col - mn) * float(1 << _ZBITS) / (mx - mn + F.lit(1.0))),
    ).cast("int")


def zvalue(xb, yb):
    """Interleave two _ZBITS-bit ints: x gets even bits, y odd bits."""
    terms = []
    for i in range(_ZBITS):
        terms.append(F.shiftleft(F.shiftright(xb, i).bitwiseAND(1), 2 * i))
        terms.append(F.shiftleft(F.shiftright(yb, i).bitwiseAND(1), 2 * i + 1))
    return reduce(lambda a, b: a + b, terms)


def _zvalue_sql(xb: str, yb: str) -> str:
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((({xb} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({yb} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_ZB_SQL_X = (
    "LEAST(255, CAST(floor((o_custkey - b.minx) * 256.0 "
    "/ (b.maxx - b.minx + 1.0)) AS INT))"
)
_ZB_SQL_Y = (
    "LEAST(255, CAST(floor((o_totalprice - b.miny) * 256.0 "
    "/ (b.maxy - b.miny + 1.0)) AS INT))"
)


@query(
    "zorder_layout",
    oracle=f"""
    WITH b AS (
      SELECT MIN(o_custkey) AS minx, MAX(o_custkey) AS maxx,
             MIN(o_totalprice) AS miny, MAX(o_totalprice) AS maxy
      FROM orders
    ), z AS (
      SELECT o_orderkey,
             {_ZB_SQL_X} AS xb,
             {_ZB_SQL_Y} AS yb
      FROM orders, b
    )
    SELECT o_orderkey, CAST(xb AS BIGINT) AS xb, CAST(yb AS BIGINT) AS yb,
           CAST({_zvalue_sql("xb", "yb")} AS BIGINT) AS zval
    FROM z
    """,
)
def zorder_layout(spark, sf_dir):
    """Z-order (Morton) key over (o_custkey, o_totalprice).

    Bounds come from one tiny aggregate broadcast-joined back (a
    2-row-free scalar join — at 100 TB the bounds would come from
    table statistics instead of a scan). The interleave itself is 32
    shift/mask terms, fully inside whole-stage codegen. Writing with
    ``repartitionByRange(zval)`` + ``sortWithinPartitions`` yields the
    clustered layout; test_layout.py proves the per-file bounding-box
    shrink against a single-column sort.
    """
    orders = load(spark, sf_dir, "orders")
    b = orders.agg(
        F.min("o_custkey").alias("minx"),
        F.max("o_custkey").alias("maxx"),
        F.min("o_totalprice").alias("miny"),
        F.max("o_totalprice").alias("maxy"),
    )
    z = (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .join(F.broadcast(b))
        .select(
            "o_orderkey",
            _bucket(F.col("o_custkey"), F.col("minx"), F.col("maxx")).alias("xb"),
            _bucket(F.col("o_totalprice"), F.col("miny"), F.col("maxy")).alias("yb"),
        )
    )
    return z.select(
        "o_orderkey",
        F.col("xb").cast("long").alias("xb"),
        F.col("yb").cast("long").alias("yb"),
        zvalue(F.col("xb"), F.col("yb")).cast("long").alias("zval"),
    )


def write_zordered(df: DataFrame, path: str, xcol: str, ycol: str,
                   n_files: int = 8) -> None:
    """Write ``df`` clustered on the z-order of (xcol, ycol).

    Library entry point used by the layout tests: computes bounds,
    buckets, z-value, then range-partitions + sorts so each output
    file covers a compact rectangle of the (x, y) space.
    """
    b = df.agg(
        F.min(xcol).alias("minx"), F.max(xcol).alias("maxx"),
        F.min(ycol).alias("miny"), F.max(ycol).alias("maxy"),
    )
    z = df.join(F.broadcast(b)).withColumn(
        "_z",
        zvalue(
            _bucket(F.col(xcol), F.col("minx"), F.col("maxx")),
            _bucket(F.col(ycol), F.col("miny"), F.col("maxy")),
        ),
    ).drop("minx", "maxx", "miny", "maxy")
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


_MV_GROUP = "o_orderpriority"
_MV_SPLIT = "1997-01-01"


@query(
    "mv_incremental",
    oracle=f"""
    SELECT {_MV_GROUP},
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS total,
           floor(CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                      AS BIGINT) / COUNT(*) + 0.5) / 100.0 AS avg_price,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders GROUP BY {_MV_GROUP}
    """,
)
def mv_incremental(spark, sf_dir):
    """Incremental MV maintenance: merge(delta partials, base partials).

    The materialized aggregate is stored as mergeable partials
    (cnt, sum, min, max); refreshing with a new slice aggregates ONLY
    the delta and merges — O(delta), not O(table). Derived measures
    (avg) are computed from the merged partials at read time, never
    stored. The key deliberately computes base (< {_MV_SPLIT}) and
    delta (>= {_MV_SPLIT}) partials separately and merges them; the
    oracle is the direct full aggregate, so the merge algebra is
    hash-verified. The price sum is kept as exact integer CENTS
    (engine determinism convention): a float sum associates
    differently in the two-stage merge than in the oracle's single
    pass, and a group near a .005 boundary would round apart —
    integer addition is order-free, so merged == direct exactly.
    """
    orders = load(spark, sf_dir, "orders").select(_MV_GROUP, "o_totalprice",
                                                  "o_orderdate")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")

    def partial(df):
        return df.groupBy(_MV_GROUP).agg(
            F.count("*").alias("cnt"),
            F.sum(cents).alias("pcents"),
            F.min("o_totalprice").alias("pmin"),
            F.max("o_totalprice").alias("pmax"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < _MV_SPLIT))
    delta = partial(orders.filter(F.col("o_orderdate") >= _MV_SPLIT))
    merged = (
        base.unionAll(delta)
        .groupBy(_MV_GROUP)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("pcents").alias("pcents"),
            F.min("pmin").alias("pmin"),
            F.max("pmax").alias("pmax"),
        )
    )
    return merged.select(
        _MV_GROUP,
        "cnt",
        (F.col("pcents") / 100.0).alias("total"),
        (
            F.floor(F.col("pcents") / F.col("cnt") + 0.5) / 100.0
        ).alias("avg_price"),
        F.round("pmin", 2).alias("min_price"),
        F.round("pmax", 2).alias("max_price"),
    )
