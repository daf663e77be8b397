"""Event analytics + introspection operators (SURVEY.md §2.B extension).

Batch analytics patterns every warehouse user of the reference's query
layer eventually asks for — sessionization, funnels, retention cohorts,
histograms, column profiling, graph ranking — each expressed as a
declarative DataFrame plan so Catalyst keeps pushdown/pruning, plus a
distributed parquet-footer inspector (the `hh`-style "look inside the
file" tool re-expressed as a query).

Scale notes are per-operator; the shared principles:

- every window partitions on a high-cardinality key (user_id), never a
  single global partition;
- group-bys whose keys are a superset of the preceding window's
  partition key reuse that exchange (HashPartitioning(user_id)
  satisfies ClusteredDistribution(user_id, session_id) — no second
  shuffle);
- iterative graph steps are bounded and each round is one shuffle
  join + one aggregation, the standard Pregel-on-DataFrames shape.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load, load_spread, materialize
from ..registry import query

_GAP_S = 1800  # session gap threshold (seconds)


@query(
    "sessionize_batch",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, value, ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
             LAG(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
      FROM events
    ), m AS (
      SELECT *, CASE WHEN prev_sec IS NULL OR ts_sec - prev_sec > 1800
                     THEN 1 ELSE 0 END AS is_new
      FROM e
    ), s AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
      FROM m
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts_sec) AS start_sec, MAX(ts_sec) AS end_sec,
           MAX(ts_sec) - MIN(ts_sec) AS duration_sec,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               / 100.0 AS total_value
    FROM s GROUP BY user_id, session_id
    """,
)
def sessionize_batch(spark, sf_dir):
    """Gap-based batch sessionization (30-min inactivity splits).

    One shuffle total: the lag/cumsum window hash-partitions on
    user_id, and the per-(user, session) aggregation's required
    clustering is satisfied by that same partitioning, so Catalyst
    plans no second exchange. user_id is the high-cardinality key at
    100 TB; there is no global window anywhere.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", "ts",
        F.unix_timestamp("ts").alias("ts_sec"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_sec").over(w).isNull()
            | (F.col("ts_sec") - F.lag("ts_sec").over(w) > _GAP_S),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return marked.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_sec").alias("start_sec"),
        F.max("ts_sec").alias("end_sec"),
        (F.max("ts_sec") - F.min("ts_sec")).alias("duration_sec"),
        # order-free: per-row cents pin -> BIGINT sum -> one IEEE
        # division (the repo's SUM(value) convention, timeseries.py)
        (
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")) / 100.0
        ).alias("total_value"),
    )


@query(
    "funnel_stages",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
          JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
          JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT * FROM (
      SELECT 1 AS stage_idx, 'view' AS stage,
             CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS users
      UNION ALL
      SELECT 2, 'click', CAST((SELECT COUNT(*) FROM c) AS BIGINT)
      UNION ALL
      SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM p) AS BIGINT)
    )
    """,
)
def funnel_stages(spark, sf_dir):
    """Ordered funnel view -> click -> purchase: users reaching each stage.

    Each stage is a per-user MIN-timestamp aggregate (map-side
    combinable, output shrinks to |users|) followed by an equi-join on
    user_id with a range predicate on the timestamps. Data volume
    collapses after the first aggregation, so later joins move only
    user-level rows — at 100 TB the event scan dominates and happens
    once per stage filter (a single-scan multi-stage variant would
    pivot event_type first; kept explicit here for plan clarity).
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def stage_min(df, etype, prev, prev_t, out_t):
        s = df.filter(F.col("event_type") == etype)
        if prev is not None:
            s = s.join(prev, "user_id").filter(F.col("ts") > F.col(prev_t))
        return s.groupBy("user_id").agg(F.min("ts").alias(out_t))

    v = stage_min(ev, "view", None, None, "t1")
    c = stage_min(ev, "click", v, "t1", "t2")
    p = stage_min(ev, "purchase", c, "t2", "t3")
    counts = [
        (1, "view", v),
        (2, "click", c),
        (3, "purchase", p),
    ]
    parts = [
        df.agg(F.count("*").alias("users")).select(
            F.lit(i).alias("stage_idx"), F.lit(name).alias("stage"), "users"
        )
        for i, name, df in counts
    ]
    out = parts[0]
    for part in parts[1:]:
        out = out.unionAll(part)
    return out


@query(
    "retention_cohort",
    oracle="""
    WITH first_ev AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT CAST(f.cohort_week AS VARCHAR) AS cohort_week,
           CAST(date_diff('day', f.cohort_week,
                          CAST(date_trunc('week', e.ts) AS DATE)) // 7
                AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users
    FROM events e JOIN first_ev f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def retention_cohort(spark, sf_dir):
    """Weekly retention cohorts: users active N weeks after first event.

    The first-event aggregate shrinks events to one row per user
    before the join; the join is an equi-join on user_id (broadcast
    when the user dimension fits, shuffle-hash otherwise — left to
    AQE). COUNT(DISTINCT user) partial-aggregates per (cohort, offset)
    group after an expand — the grouping key space is tiny (weeks x
    offsets), so the final exchange moves almost nothing.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    first_ev = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    joined = ev.join(first_ev, "user_id")
    return (
        joined.select(
            "user_id",
            F.col("cohort_week").cast("string").alias("cohort_week_s"),
            (
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"),
                           F.col("cohort_week"))
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy(F.col("cohort_week_s").alias("cohort_week"), F.col("week_offset"))
        .agg(F.countDistinct("user_id").alias("users"))
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 30000) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / 30000) AS BIGINT) * 30000.0 AS lo,
           (CAST(floor(o_totalprice / 30000) AS BIGINT) + 1) * 30000.0 AS hi,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           floor(CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                      AS BIGINT) / COUNT(*) + 0.5) / 100.0 AS avg_price
    FROM orders GROUP BY 1
    """,
)
def agg_histogram(spark, sf_dir):
    """Equi-width histogram of order totals (explicit bucket math).

    Pure scan + tiny group-by: the bucket expression is JVM-side
    whole-stage-codegen, partial aggregation collapses each scan
    partition to <= n_buckets rows, and the final exchange moves only
    bucket-count pairs. This is the canonical O(1)-output scan shape
    that holds at any scale.
    """
    bucket = F.floor(F.col("o_totalprice") / 30000).cast("long")
    return (
        load(spark, sf_dir, "orders")
        .select(
            bucket.alias("bucket"),
            (bucket * 30000.0).alias("lo"),
            ((bucket + 1) * 30000.0).alias("hi"),
            "o_totalprice",
        )
        .groupBy("bucket", "lo", "hi")
        .agg(
            F.count("*").alias("cnt"),
            # order-free mean: integer cents sum, floor-pinned to 2dp
            # (AVG of doubles is never safe cross-engine)
            (
                F.floor(
                    F.sum(
                        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
                    )
                    / F.count("*")
                    + 0.5
                )
                / 100.0
            ).alias("avg_price"),
        )
    )


@query(
    "profile_columns",
    oracle="""
    SELECT 'l_orderkey' AS col_name,
           CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(l_orderkey) AS VARCHAR) AS min_val,
           CAST(MAX(l_orderkey) AS VARCHAR) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', COUNT(*) - COUNT(l_returnflag),
           COUNT(DISTINCT l_returnflag),
           MIN(l_returnflag), MAX(l_returnflag) FROM lineitem
    UNION ALL
    SELECT 'l_linestatus', COUNT(*) - COUNT(l_linestatus),
           COUNT(DISTINCT l_linestatus),
           MIN(l_linestatus), MAX(l_linestatus) FROM lineitem
    UNION ALL
    SELECT 'l_suppkey', COUNT(*) - COUNT(l_suppkey),
           COUNT(DISTINCT l_suppkey),
           CAST(MIN(l_suppkey) AS VARCHAR), CAST(MAX(l_suppkey) AS VARCHAR)
    FROM lineitem
    """,
)
def profile_columns(spark, sf_dir):
    """Column profiler: nulls / exact distinct / min / max per column.

    One aggregate computes every measure in a single pass; the
    multi-COUNT(DISTINCT) plans as one Expand (xN rows map-side) —
    the documented cost of exact profiling. The approximate profiler
    for 100 TB is `agg_approx_distinct`'s HLL path; this key is the
    exact anchor. min/max are rendered as strings only for integer
    and varchar columns (float formatting is engine-specific).
    """
    li = load(spark, sf_dir, "lineitem")
    total = F.count("*")
    agg = li.agg(
        total.alias("_n"),
        *[
            x
            for c in ("l_orderkey", "l_returnflag", "l_linestatus", "l_suppkey")
            for x in (
                F.count(c).alias(f"{c}_nn"),
                F.countDistinct(c).alias(f"{c}_nd"),
                F.min(c).cast("string").alias(f"{c}_min"),
                F.max(c).cast("string").alias(f"{c}_max"),
            )
        ],
    )
    rows = []
    for c in ("l_orderkey", "l_returnflag", "l_linestatus", "l_suppkey"):
        rows.append(
            agg.select(
                F.lit(c).alias("col_name"),
                (F.col("_n") - F.col(f"{c}_nn")).alias("n_nulls"),
                F.col(f"{c}_nd").alias("n_distinct"),
                F.col(f"{c}_min").alias("min_val"),
                F.col(f"{c}_max").alias("max_val"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


@query(
    "join_bloom_runtime",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) / 100.0 AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9000
    GROUP BY o.o_orderpriority
    """,
)
def join_bloom_runtime(spark, sf_dir):
    """Selective-dim fact join under Spark's runtime bloom filter.

    spark.sql.optimizer.runtime.bloomFilter.enabled is on (session
    default): with a creation side under creationSideThreshold and a
    fact scan above applicationSideScanSizeThreshold, Catalyst injects
    a might_contain(bloom_agg(c_custkey)) predicate into the orders
    scan — rows that cannot join are dropped at the scan, before the
    shuffle. At sf0.01 the fact side is below the 10 GiB application
    threshold so the filter does not fire (the join is broadcast
    anyway); test_plans.py forces the thresholds down and asserts the
    bloom filter appears, proving the 100 TB path is wired.
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000)
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            # order-free cents-scaled sum (layout.py convention)
            (
                F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
                / 100.0
            ).alias("revenue"),
        )
    )


def _edge_pairs(spark, sf_dir) -> DataFrame:
    """Raw (src, dst) co-occurrence pairs, NOT yet deduplicated."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # pre-distinct the fact projection: shrinks the join probe side and
    # the final distinct's input (~25% on the edge build at sf0.1);
    # result is identical since the pair stream is distinct'd downstream
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).distinct()
    return orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_suppkey") + 1000000).alias("dst"),
    )


def _edges(spark, sf_dir) -> DataFrame:
    """Undirected customer--supplier edges from co-occurrence in orders.

    Distinct (o_custkey, l_suppkey) pairs; supplier node ids are
    offset by 1e6 to keep the two id spaces disjoint, then the edge
    set is symmetrized so no node dangles.
    """
    e = _edge_pairs(spark, sf_dir).distinct()
    return e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


#: bounded (size-1) cache of the persisted symmetric edge set + degree
#: vector shared by the iterative graph family (pagerank / LPA /
#: modularity). Keyed on (SparkContext, sf_dir, n_part); inserting a
#: new key UNPERSISTS the previous entry, so a session holds at most
#: one cached graph regardless of how many graph keys run — the
#: leak-per-invocation the per-call ``.persist()`` pattern had is gone,
#: and consecutive graph keys in a suite run reuse one edge build.
_GRAPH_BASE_CACHE: dict = {}


#: size-1 memo of the layout decision (pure metadata, no Spark state)
_GRAPH_LAYOUT_CACHE: dict = {}


def _graph_layout(spark, sf_dir) -> tuple[int, str]:
    """(n_part, partition column) for the cached edge set.

    **n_part is derived from the edge build's INPUT SIZE, not from a
    core-count constant** (r14; guide §2.4 scale-adaptive
    partitioning): the r13 form ``defaultParallelism // 4, floor 8``
    ran the Pregel rounds 8-wide at BOTH 8 and 32 cores at every SF —
    the r14 sf1 scaling proof measured 24 of 32 cores idle. One
    partition per ~4 MB of the lineitem fact (the edge build's driver)
    reproduces the r13-measured optimum at sf0.1 (10.8 MB → floor 8,
    where 32 partitions measured 4.0 s vs 2.6 s on 16k groups) and
    widens with the data (sf1: 108 MB → 27); non-local / unstat-able
    inputs fall back to full parallelism, the cluster-correct default.

    **Partition column is gated on a PROVABLE node-count bound**: node
    ids are customer keys plus offset supplier keys, so
    ``count(customer) + count(supplier)`` (two parquet metadata
    counts) bounds |V| from above. Under ``_BC_GATE_ROWS`` the rank /
    label vectors are guaranteed to broadcast, the per-round join on
    ``src`` never moves the edges, and partitioning them by ``dst``
    instead makes every per-round gather aggregation
    (``groupBy(dst ...)``) exchange-free — zero shuffles per Pregel
    round. Past the bound the vectors may have to shuffle TO the
    edges, so the layout stays ``src`` (the r13 / 100 TB shape:
    vector-sized exchanges per round, edges never move).
    """
    dp = spark.sparkContext.defaultParallelism
    key = (id(spark.sparkContext), str(sf_dir), dp)
    hit = _GRAPH_LAYOUT_CACHE.get(key)
    if hit is not None:
        return hit
    from ..io import table_bytes

    tb = table_bytes(sf_dir, "lineitem")
    n_part = dp if not tb else max(
        min(dp, tb // (4 << 20)), max(dp // 4, 8)
    )
    # |V| bound from parquet FOOTER row counts (driver-side, ~ms —
    # a Spark count here would pay two relation builds per graph key);
    # non-local / non-single-file tables fall back to the scale-safe
    # src layout, which is the correct default for exactly those.
    bound = _BC_GATE_ROWS + 1
    try:
        import pyarrow.parquet as pq

        bound = (
            pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
            + pq.ParquetFile(f"{sf_dir}/supplier.parquet").metadata.num_rows
        )
    except Exception:
        pass
    out = (n_part, "dst" if bound <= _BC_GATE_ROWS else "src")
    _GRAPH_LAYOUT_CACHE.clear()
    _GRAPH_LAYOUT_CACHE[key] = out
    return out


def _graph_base(spark, sf_dir):
    """Memoized (edges, deg): symmetric edges repartitioned on the
    `_graph_layout` column and persisted, plus the persisted
    out-degree vector. In the broadcast regime the dst-hash
    partitioning is what every per-round gather aggregation reuses; in
    the scale regime the src-hash partitioning is what the per-round
    vector join reuses — either way edges never move after the build.
    The dedup rides the layout exchange (`dropDuplicates` after
    `repartition` needs only ClusteredDistribution on a subset of its
    keys), so the build pays ONE exchange where the r13 form paid two
    (distinct by (src,dst), then repartition by src).

    (An r10 experiment pre-joined ``dst_outdeg`` onto the edge set to
    drop pagerank's per-round degree-repair join; the cold-build cost
    outweighed the per-round saving under the cache-isolated bench
    protocol, so the edge set stays (src, dst) — recorded here so the
    idea isn't re-tried without re-measuring.)"""
    n_part, col = _graph_layout(spark, sf_dir)
    key = (id(spark.sparkContext), str(sf_dir), n_part, col)
    hit = _GRAPH_BASE_CACHE.get(key)
    if hit is not None:
        edges, deg = hit
        # an external spark.catalog.clearCache() (bench harnesses do
        # this between keys) REMOVES the CacheManager registration —
        # while DataFrame.is_cached keeps reporting a stale True — so
        # a memo hit must re-check the real registry and re-persist,
        # or every later action silently recomputes the edge build
        # per use (measured 2× on pagerank, r10). Any failure here
        # (e.g. the entry's context died and its id was reused) drops
        # the entry and falls through to a fresh build.
        try:
            cm = spark._jsparkSession.sharedState().cacheManager()
            if cm.lookupCachedData(edges._jdf).isEmpty():
                edges.persist()
                deg.persist()
            return edges, deg
        except Exception:
            _GRAPH_BASE_CACHE.pop(key, None)
    for old_edges, old_deg in _GRAPH_BASE_CACHE.values():
        try:
            old_edges.unpersist()
            old_deg.unpersist()
        except Exception:
            # the evicted entry may belong to a STOPPED SparkContext
            # (tests/benches cycle sessions); its blocks died with the
            # context, so a failed unpersist is already-done cleanup —
            # it must not poison the new session's first graph query
            pass
    _GRAPH_BASE_CACHE.clear()
    pairs = _edge_pairs(spark, sf_dir)
    sym = pairs.unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # dedup AFTER the layout exchange: HashPartitioning([col]) already
    # clusters (src, dst), so dropDuplicates adds no exchange — same
    # distinct edge set as _edges() (the two id spaces are disjoint,
    # so symmetrize-then-dedup == dedup-then-symmetrize)
    edges = sym.repartition(n_part, col).dropDuplicates().persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    _GRAPH_BASE_CACHE[key] = (edges, deg)
    return edges, deg


#: measured-cardinality gate for broadcasting the graph family's
#: node-scaling vectors (ranks / labels / community maps). These grow
#: with |V|, so a STATIC hint would pin a driver-OOM-able plan at the
#: 100 TB target (the r9 verdict's scale-killer); but every graph key
#: already counts |V| driver-side (the 1/n teleport, the LPA seed
#: census), so the hint can be gated on the MEASURED count instead:
#: ≤ 2M rows (~64 MB at 32 B/row) broadcasts — past that the vector
#: reaches the join unhinted and shuffles to the cached
#: src-partitioned edge set. Unlike AQE's stage-boundary conversion
#: (which still materializes the vector's exchange before deciding —
#: measured 1.2–1.7× on pagerank at sf0.1), the gate decides BEFORE
#: the plan is built, with exact knowledge. tests/test_plans.py pins
#: both behaviors: gate forced to 0 (the 100 TB cardinality) ⇒ zero
#: broadcast hints anywhere in the graph family's plans.
_BC_GATE_ROWS = 2_000_000


def _bc_if_small(df, n_rows: int):
    """Broadcast ``df`` only when its MEASURED row count fits the
    gate; identity otherwise (see `_BC_GATE_ROWS`)."""
    return F.broadcast(df) if n_rows <= _BC_GATE_ROWS else df


_PR_ORACLE_EDGES = """
    edges AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    sym AS (SELECT src, dst FROM edges
            UNION ALL SELECT dst, src FROM edges),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
            FROM sym GROUP BY src)
"""


@query(
    "graph_degree",
    oracle=f"""
    WITH {_PR_ORACLE_EDGES}
    SELECT outdeg AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY outdeg
    """,
)
def graph_degree(spark, sf_dir):
    """Degree distribution of the customer-supplier co-occurrence graph.

    Edge build is one equi-join + distinct; degree and histogram are
    two cascaded group-bys whose outputs shrink monotonically — the
    second group-by's input is |nodes| rows regardless of edge count.
    """
    deg = _edges(spark, sf_dir).groupBy("src").agg(F.count("*").alias("outdeg"))
    return deg.groupBy(F.col("outdeg").alias("degree")).agg(
        F.count("*").alias("n_nodes")
    )


def _pr_round_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT d.node,
             0.15 / (SELECT n FROM nn)
               + 0.85 * COALESCE(SUM(p.r / p.outdeg), 0) AS r,
             d.outdeg
      FROM deg d
      LEFT JOIN sym ON sym.dst = d.node
      LEFT JOIN {prev} p ON p.node = sym.src
      GROUP BY d.node, d.outdeg
    )"""


@query(
    "graph_pagerank",
    oracle=f"""
    WITH {_PR_ORACLE_EDGES},
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r, outdeg FROM deg),
    {_pr_round_sql("r0", "r1")},
    {_pr_round_sql("r1", "r2")},
    {_pr_round_sql("r2", "r3")}
    SELECT node, ROUND(r, 8) AS rank FROM r3
    """,
)
def graph_pagerank(spark, sf_dir):
    """3-iteration PageRank (d=0.85) over the symmetric co-occurrence graph.

    Pregel-on-DataFrames: each round joins the cached edge set with
    the rank vector and aggregates contributions on dst — the minimal
    per-superstep cost. The rank vector is |nodes| rows and scales
    with the graph, so it carries no STATIC broadcast hint; instead
    the hint is gated on the MEASURED node count (`_bc_if_small` —
    n is already collected for the 1/n teleport term): at fixture
    scales the vector broadcasts exactly as before, past
    `_BC_GATE_ROWS` it reaches the join unhinted and shuffles to the
    cached src-hash-partitioned edge set — either way edges never
    move after the initial build, and a 100 TB graph structurally
    cannot OOM the driver on a hint (the gated plan is pinned by
    tests/test_plans.py with the gate forced to 0). 3 bounded rounds
    keep the plan finite and the oracle unrollable; at hundreds of
    rounds a periodic localCheckpoint would bound plan size.
    Symmetrized edges mean no dangling-mass correction is needed.

    The cached edge set is re-hashed on src into defaultParallelism/4
    partitions (floor 8): the per-round contribution aggregation is
    16 k groups over ~1 M rows, where 32+ shuffle-partition tasks are
    overhead-bound (measured 2.6 s vs 4.0 s at sf0.1), and src-hash
    partitioning lets the degree aggregation reuse the exchange. The
    divisor scales the count with cluster size, so a 1000-executor
    deployment still gets one partition per few cores rather than 8.
    """
    edges, deg = _graph_base(spark, sf_dir)
    n = deg.count()
    ranks = deg.select("src", (F.lit(1.0) / n).alias("r"), "outdeg")
    for i in range(3):
        contribs = (
            edges.join(_bc_if_small(ranks, n), "src")
            .select(F.col("dst").alias("node"), (F.col("r") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = (
            deg.join(contribs, deg.src == F.col("node"), "left")
            .select(
                "src",
                (0.15 / n + 0.85 * F.coalesce(F.col("csum"), F.lit(0.0))).alias("r"),
                "outdeg",
            )
        )
        # In the broadcast regime the dst-partitioned edge cache makes
        # the gather aggregation exchange-free (r14) — which also
        # removes the shuffle AQE used to REUSE each round's result
        # inside the next round's broadcast subtree: uncached, round
        # k's broadcast re-executes rounds 1..k-1 from the edges (6
        # |E|-joins for 3 rounds instead of 3; measured 1.02-1.25×).
        # Caching the |nodes|-row vector restores one-execution-per-
        # round. Gated on the same measured count as the broadcast
        # itself, so a 100 TB rank vector is never pinned; there the
        # per-round exchange exists and is reused as before. Not the
        # last round: the returned frame is consumed once by the sink.
        if n <= _BC_GATE_ROWS and i < 2:
            ranks = ranks.cache()
    return ranks.select(F.col("src").alias("node"), F.round("r", 8).alias("rank"))


_META_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("row_group_id", T.LongType()),
        T.StructField("column", T.StringType()),
        T.StructField("num_values", T.LongType()),
        T.StructField("compressed_bytes", T.LongType()),
        T.StructField("uncompressed_bytes", T.LongType()),
    ]
)


@query(
    "parquet_meta",
    oracle="""
    SELECT regexp_extract(file_name, '([^/]+)$', 1) AS file,
           CAST(row_group_id AS BIGINT) AS row_group_id,
           replace(path_in_schema, ', ', '.') AS column,
           CAST(num_values AS BIGINT) AS num_values,
           CAST(total_compressed_size AS BIGINT) AS compressed_bytes,
           CAST(total_uncompressed_size AS BIGINT) AS uncompressed_bytes
    FROM parquet_metadata('/root/testdata/sf0.01/*.parquet')
    """,
)
def parquet_meta(spark, sf_dir):
    """Distributed parquet footer inspection (column-chunk statistics).

    The `hh`-style "what is inside this file" tool as a query: file
    paths are discovered driver-side (names only), parallelized, and
    each task reads ONLY the parquet footer of its files via pyarrow —
    a ranged read of a few KB per file, never the data pages. On a
    100 TB lake with 10^6 files this is the manifest-scan pattern:
    one task per path batch, footer-only I/O, output proportional to
    row-group x column count. Oracle: DuckDB's parquet_metadata() over
    the same files (both read the identical footer bytes).
    """
    import os

    sc = spark.sparkContext
    listed = sorted(
        p
        for p in __import__("glob").glob(f"{sf_dir}/*.parquet")
        if os.path.isfile(p)  # directory-style tables hold the files
    ) + sorted(
        os.path.join(d, f)
        for d in __import__("glob").glob(f"{sf_dir}/*.parquet")
        if os.path.isdir(d)
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )
    if not listed:  # empty dir: empty result, not an infer-schema crash
        return spark.createDataFrame([], _META_SCHEMA)
    from ..io import local_rows_df

    paths_df = local_rows_df(
        spark, [(p,) for p in listed], "path string",
        slices=min(len(listed), sc.defaultParallelism),
    )

    def read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for p in pdf["path"]:
                meta = pq.ParquetFile(p).metadata
                base = os.path.basename(p)
                for rg in range(meta.num_row_groups):
                    g = meta.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        out.append(
                            (
                                base,
                                rg,
                                col.path_in_schema,
                                col.num_values,
                                col.total_compressed_size,
                                col.total_uncompressed_size,
                            )
                        )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "file",
                        "row_group_id",
                        "column",
                        "num_values",
                        "compressed_bytes",
                        "uncompressed_bytes",
                    ],
                )

    return paths_df.mapInPandas(read_footers, schema=_META_SCHEMA)


_SKY_AGG_SQL = """
      SELECT o_custkey,
             ROUND(MAX(o_totalprice), 2) AS max_price,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
"""


@query(
    "skyline_pareto",
    oracle=f"""
    WITH a AS ({_SKY_AGG_SQL})
    SELECT o_custkey, max_price, n_orders FROM a t
    WHERE NOT EXISTS (
      SELECT 1 FROM a u
      WHERE u.max_price >= t.max_price AND u.n_orders >= t.n_orders
        AND (u.max_price > t.max_price OR u.n_orders > t.n_orders)
    )
    """,
)
def skyline_pareto(spark, sf_dir):
    """Skyline (Pareto frontier) of customers maximizing
    (max order price, order count) — the classic multi-criteria OLAP
    operator, distributed in two phases.

    Phase 1 prunes locally: each partition sorts by max_price desc and
    keeps only rows whose n_orders exceeds the running maximum — any
    row dominated within its partition is dominated globally, so
    survivors shrink to ~O(frontier) per partition with zero shuffle.
    Phase 2 resolves the global frontier with a dominance anti-join
    over the (small) survivor set — broadcast theta-join, fully
    distributed, no driver collect. Both dimensions are
    order-insensitive aggregates (MAX, COUNT), so the frontier
    comparison is FP-exact across engines.
    """
    agg = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.count("*").alias("n_orders"),
        )
    )

    def local_skyline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(
                ["max_price", "n_orders"], ascending=[False, False]
            )
            best = -1
            keep = []
            for n in pdf["n_orders"]:
                keep.append(n > best)
                if n > best:
                    best = n
            # rows tying a kept row on both dims survive too: they are
            # not STRICTLY dominated (phase 2 settles cross-partition)
            import numpy as np

            mask = np.array(keep) | pdf.duplicated(
                subset=["max_price", "n_orders"], keep=False
            ).to_numpy()
            yield pdf[mask]

    # materialize before the self anti-join: both sides would
    # otherwise re-run the Python skyline stage (io.materialize rule)
    survivors = materialize(agg.mapInPandas(local_skyline, schema=agg.schema))
    s = survivors.alias("s")
    d = F.broadcast(survivors).alias("d")
    dominated = (
        (F.col("d.max_price") >= F.col("s.max_price"))
        & (F.col("d.n_orders") >= F.col("s.n_orders"))
        & (
            (F.col("d.max_price") > F.col("s.max_price"))
            | (F.col("d.n_orders") > F.col("s.n_orders"))
        )
    )
    return s.join(d, dominated, "left_anti").select(
        "o_custkey", "max_price", "n_orders"
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_bitmap_distinct(spark, sf_dir):
    """Exact distinct counting via Spark 4 bitmap aggregates.

    Two-level plan: keys are first folded into fixed-size bitmap
    buckets per group (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg — each bucket covers 2^15 key positions, so
    executor memory per partial state is bounded at 4 KB regardless of
    key cardinality), then bucket popcounts sum per group. This is the
    warehouse bitmap-index pattern for distinct acceleration: partials
    merge by OR, so map-side combine works and re-aggregation over
    pre-built bitmaps is O(buckets), not O(rows). Oracle is the plain
    COUNT(DISTINCT) — the bitmap algebra must reproduce it exactly.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("_bm_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(SUM(cnt) AS BIGINT) AS n_customers
        FROM (
          SELECT o_orderpriority,
                 bitmap_bucket_number(o_custkey) AS bucket,
                 bitmap_count(
                   bitmap_construct_agg(bitmap_bit_position(o_custkey))
                 ) AS cnt
          FROM _bm_orders
          GROUP BY 1, 2
        )
        GROUP BY o_orderpriority
        """
    )


#: hot-blocking-key guard for the common-neighbor join: parts bought by
#: more than this many distinct customers are dropped from candidate
#: generation (a part in everyone's basket carries no similarity signal
#: and its candidate block grows as deg² — the stop-word rule of
#: blocking-based similarity).
_CN_CAP = 30
_CN_MIN = 3


@query(
    "graph_common_neighbors",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    pd AS (SELECT p, COUNT(*) AS n FROM e GROUP BY p),
    ek AS (SELECT e.c, e.p FROM e JOIN pd USING (p) WHERE pd.n <= {_CN_CAP}),
    cd AS (SELECT c, COUNT(*) AS deg FROM ek GROUP BY c),
    cn AS (
      SELECT a.c AS cust_a, b.c AS cust_b, COUNT(*) AS common
      FROM ek a JOIN ek b ON a.p = b.p AND a.c < b.c
      GROUP BY a.c, b.c HAVING COUNT(*) >= {_CN_MIN}
    )
    SELECT cust_a, cust_b, common,
           ROUND(common * 1.0 / (da.deg + db.deg - common), 6) AS jaccard
    FROM cn
    JOIN cd da ON da.c = cust_a
    JOIN cd db ON db.c = cust_b
    """,
)
def graph_common_neighbors(spark, sf_dir):
    """Common-neighbor similarity (link prediction): customer pairs
    sharing >= _CN_MIN (3) distinct purchased parts, scored with the
    neighborhood Jaccard — the co-purchase "customers also bought"
    primitive.

    The pair join blocks on the shared part (an equi key, never an
    all-pairs scan) and candidate volume is sum(deg_p²) — so parts
    above the `_CN_CAP` degree cap are pruned first, the stop-word
    rule that keeps a viral blocking key from turning one reducer
    quadratic at 100 TB. Degrees are computed on the SAME capped edge
    set so the Jaccard denominator is consistent; the count aggregate
    rides the pair join's partitioning.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    e = materialize(e)
    pd_deg = e.groupBy("p").agg(F.count("*").alias("n"))
    ek = materialize(
        e.join(pd_deg.filter(F.col("n") <= _CN_CAP), "p", "left_semi")
    )
    cd = ek.groupBy("c").agg(F.count("*").alias("deg"))
    a, b = ek.alias("a"), ek.alias("b")
    cn = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.c") < F.col("b.c")))
        .groupBy(F.col("a.c").alias("cust_a"), F.col("b.c").alias("cust_b"))
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= _CN_MIN)
    )
    da = cd.select(F.col("c").alias("cust_a"), F.col("deg").alias("da"))
    db = cd.select(F.col("c").alias("cust_b"), F.col("deg").alias("db"))
    return (
        cn.join(da, "cust_a")
        .join(db, "cust_b")
        .select(
            "cust_a",
            "cust_b",
            "common",
            F.round(
                F.col("common") * 1.0 / (F.col("da") + F.col("db") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "graph_triangles",
    oracle="""
    WITH ip AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_size <= 10
    ),
    e AS (
        SELECT DISTINCT a.p AS pa, b.p AS pb
        FROM ip a JOIN ip b ON a.o = b.o AND a.p < b.p
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
        GROUP BY node
    ),
    o AS (
        SELECT CASE WHEN (da.d, e.pa) < (db.d, e.pb) THEN e.pa ELSE e.pb END AS s,
               CASE WHEN (da.d, e.pa) < (db.d, e.pb) THEN e.pb ELSE e.pa END AS t,
               CASE WHEN (da.d, e.pa) < (db.d, e.pb) THEN db.d ELSE da.d END AS dt
        FROM e
        JOIN deg da ON da.node = e.pa
        JOIN deg db ON db.node = e.pb
    ),
    w AS (
        SELECT o1.t AS b, o2.t AS c
        FROM o o1 JOIN o o2
          ON o1.s = o2.s AND (o1.dt, o1.t) < (o2.dt, o2.t)
    ),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM w WHERE EXISTS (SELECT 1 FROM o WHERE o.s = w.b AND o.t = w.c)
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
           CAST(tri.n_triangles AS BIGINT) AS n_triangles,
           floor(3.0 * tri.n_triangles
                 / (SELECT SUM(d * (d - 1) / 2) FROM deg)
                 * 1000000 + 0.5) / 1000000 AS clustering6
    FROM tri
    """,
)
def graph_triangles(spark, sf_dir):
    """Exact triangle count of the part co-purchase graph (parts with
    ``p_size <= 10`` sharing an order) + global clustering coefficient.

    Degree-ordered orientation — every edge points from its
    (degree, id)-smaller endpoint, so each triangle is generated by
    exactly one wedge at its lowest-ranked apex and closed by ONE
    equi semi-join. That is the published scale shape: candidate
    wedges are Σ outdeg² where out-degrees are degree-capped by the
    orientation (O(m^1.5) total work), so a power-law hub never
    explodes — the hot node's edges all point INTO it and it apexes
    no wedges. No global rank/window anywhere: the orientation uses
    the (degree, node) tuple order directly, which Spark evaluates as
    struct comparison — everything is equi-joins + filters.
    """
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    ip = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = ip.alias("a"), ip.alias("b")
    e = materialize(
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .distinct()
    )
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("node").alias("pa"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("pb"), F.col("d").alias("db"))
    lt = F.struct(F.col("da"), F.col("pa")) < F.struct(F.col("db"), F.col("pb"))
    o = materialize(
        e.join(da, "pa")
        .join(db, "pb")
        .select(
            F.when(lt, F.col("pa")).otherwise(F.col("pb")).alias("s"),
            F.when(lt, F.col("pb")).otherwise(F.col("pa")).alias("t"),
            F.when(lt, F.col("db")).otherwise(F.col("da")).alias("dt"),
        )
    )
    o1, o2 = o.alias("o1"), o.alias("o2")
    w = o1.join(
        o2,
        (F.col("o1.s") == F.col("o2.s"))
        & (
            F.struct(F.col("o1.dt"), F.col("o1.t"))
            < F.struct(F.col("o2.dt"), F.col("o2.t"))
        ),
    ).select(F.col("o1.t").alias("b"), F.col("o2.t").alias("c"))
    tri = w.join(
        o.select(F.col("s").alias("b"), F.col("t").alias("c")),
        ["b", "c"],
        "left_semi",
    ).agg(F.count("*").alias("n_triangles"))
    counts = (
        deg.agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
        )
        .join(e.agg(F.count("*").alias("n_edges")))
        .join(tri)
    )
    return counts.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        (
            F.floor(
                3.0 * F.col("n_triangles") / F.col("n_wedges") * 1_000_000 + 0.5
            )
            / 1_000_000
        ).alias("clustering6"),
    )


#: count-min sketch geometry: 4 independent md5-salted hash rows of
#: 512 buckets — 2 048 counters of bounded, OR-of-sums mergeable state
#: regardless of stream cardinality.
_CMS_D, _CMS_W = 4, 512


@query(
    "agg_count_min",
    oracle=f"""
    WITH inc AS (
        SELECT l_partkey, j,
               ('0x' || SUBSTR(MD5(l_partkey::VARCHAR), j * 8 + 1, 8))::BIGINT
                   % {_CMS_W} AS bucket
        FROM lineitem, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS j)
    ),
    sketch AS (
        SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM inc GROUP BY j, bucket
    ),
    probes AS (
        SELECT l_partkey AS part_key, CAST(COUNT(*) AS BIGINT) AS true_cnt
        FROM lineitem WHERE l_partkey % 100 = 7 GROUP BY l_partkey
    ),
    est AS (
        SELECT p.part_key, p.true_cnt, MIN(s.cnt) AS cms_est
        FROM probes p,
             (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS j) jj
        JOIN sketch s
          ON s.j = jj.j
         AND s.bucket = ('0x' || SUBSTR(MD5(p.part_key::VARCHAR),
                                        jj.j * 8 + 1, 8))::BIGINT % {_CMS_W}
        GROUP BY p.part_key, p.true_cnt
    )
    SELECT part_key, true_cnt, CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - true_cnt AS BIGINT) AS overcount
    FROM est
    """,
)
def agg_count_min(spark, sf_dir):
    """Count-min sketch frequency estimation over ``l_partkey`` with
    exact ground truth per probe key.

    The sketch is d×w = 2 048 counters — bounded partial state that
    merges by cell-wise addition, the canonical bounded-memory
    frequency structure for a 100 TB stream (contrast
    ``agg_heavy_hitters``'s exact twin). The d hash rows are FOUR
    disjoint 32-bit slices of ONE md5 per key — one hash computation,
    not d (md5 dominated this key's wall time 4× before the fold-in);
    both engines slice the identical digest so buckets still match.
    Estimates are provably ≥ the true count (asserted per-row in
    pytest). Build is one partial-aggregated groupBy on (j, bucket);
    probing joins the tiny probe set against the 2 048-row sketch —
    both broadcastable.
    """
    li = load_spread(spark, sf_dir, "lineitem")
    js = F.array(*[F.lit(j) for j in range(_CMS_D)])

    def slice_bucket(h, j):
        # slice row j's 32-bit window out of the already-computed digest
        return (
            F.conv(F.substr(h, j * 8 + 1, F.lit(8)), 16, 10).cast("long")
            % _CMS_W
        )

    # md5 BEFORE the explode: Generate replicates the digest column d
    # times instead of re-hashing per exploded row (the "one md5 per
    # key, not d" promise — an expression above the Generate is
    # evaluated d times, Catalyst never hoists it below)
    inc = li.select(
        F.md5(F.col("l_partkey").cast("string")).alias("h"),
        F.explode(js).alias("j"),
    ).select("j", slice_bucket(F.col("h"), F.col("j")).alias("bucket"))
    sketch = inc.groupBy("j", "bucket").agg(F.count("*").alias("cnt"))
    # probes reads the UNSPREAD scan: the %100 filter keeps ~1% of
    # rows and runs scan-side, so routing this branch through li's
    # round-robin exchange would shuffle 600k rows to discard 99% of
    # them (profiled r13: the spread's 1-task map side re-paid per
    # branch); the 6k survivors aggregate fine at scan parallelism
    probes = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey")
        .filter(F.col("l_partkey") % 100 == 7)
        .groupBy(F.col("l_partkey").alias("part_key"))
        .agg(F.count("*").alias("true_cnt"))
    )
    probe_cells = probes.select(
        "part_key",
        "true_cnt",
        F.md5(F.col("part_key").cast("string")).alias("h"),
        F.explode(js).alias("j"),
    ).select(
        "part_key",
        "true_cnt",
        "j",
        slice_bucket(F.col("h"), F.col("j")).alias("bucket"),
    )
    return (
        probe_cells.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("part_key", "true_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "part_key",
            "true_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("true_cnt")).alias("overcount"),
        )
    )


@query(
    "graph_khop",
    oracle=f"""
    WITH {_PR_ORACLE_EDGES},
    seeds AS (
        SELECT DISTINCT c_custkey AS node FROM customer
        WHERE c_custkey % 100 = 1
    ),
    h1 AS (
        SELECT DISTINCT sym.dst AS node
        FROM seeds JOIN sym ON sym.src = seeds.node
    ),
    h2 AS (
        SELECT DISTINCT sym.dst AS node
        FROM h1 JOIN sym ON sym.src = h1.node
    ),
    reached AS (
        SELECT node, 0 AS hop FROM seeds
        UNION ALL SELECT node, 1 FROM h1
        UNION ALL SELECT node, 2 FROM h2
    ),
    first_hop AS (
        SELECT node, MIN(hop) AS hop FROM reached GROUP BY node
    )
    SELECT CAST(hop AS BIGINT) AS hop,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM first_hop GROUP BY hop
    """,
)
def graph_khop(spark, sf_dir):
    """Bounded k-hop reachability (BFS frontier, k = 2) from a seed
    customer set over the co-purchase graph — nodes counted at their
    FIRST reach hop.

    The Pregel-lite shape shared with graph_pagerank: each hop is ONE
    equi-join frontier ⋈ edges + a distinct, so k hops cost k bounded
    shuffles — no recursion, no driver loop state beyond the loop
    counter. Frontiers are node-id sets (never paths), so frontier
    size is bounded by |V| regardless of path multiplicity — the
    property that keeps BFS from exploding on dense graphs. Min-hop
    dedup runs once at the end on the union of frontiers.
    """
    e = materialize(_edges(spark, sf_dir))
    seeds = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 100 == 1)
        .select(F.col("c_custkey").alias("node"))
        .distinct()
    )
    frontiers = [seeds.withColumn("hop", F.lit(0))]
    frontier = seeds
    for hop in (1, 2):
        # cache each frontier: it feeds BOTH the next hop's join and
        # the final union — uncached, hop-1's join+distinct would run
        # twice. Frontiers are node-id sets bounded by |V|, so the
        # cache is scale-safe (never paths, never edges).
        frontier = materialize(
            frontier.join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        frontiers.append(frontier.withColumn("hop", F.lit(hop)))
    reached = frontiers[0]
    for f in frontiers[1:]:
        reached = reached.unionAll(f)
    return (
        reached.groupBy("node")
        .agg(F.min("hop").alias("hop"))
        .groupBy("hop")
        .agg(F.count("*").alias("n_nodes"))
        .select(F.col("hop").cast("long").alias("hop"), "n_nodes")
    )


def _lp_round_sql(prev: str, out: str) -> str:
    """One synchronous label-propagation round: count labeled
    neighbors per (node, label), pick the mode with the smallest-label
    tie-break, pin seeds, and carry the previous label where no
    neighbor is labeled."""
    return f"""
    {out}_nb AS (
      SELECT sym.dst AS node, p.lbl AS lbl, COUNT(*) AS c
      FROM sym JOIN {prev} p ON p.node = sym.src
      WHERE p.lbl IS NOT NULL
      GROUP BY sym.dst, p.lbl
    ),
    {out}_best AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, lbl ASC) AS rn
        FROM {out}_nb
      ) WHERE rn = 1
    ),
    {out} AS (
      SELECT d.node,
             CASE WHEN d.node % 10 = 0 THEN d.node % 7
                  ELSE COALESCE(b.lbl, p.lbl) END AS lbl
      FROM deg d
      LEFT JOIN {out}_best b ON b.node = d.node
      LEFT JOIN {prev} p ON p.node = d.node
    )"""


_LPA_CACHE: dict = {}


def _lpa_labels(spark, sf_dir):
    """Shared 3-round synchronous LPA core (see graph_label_prop for
    the algorithm contract): returns (labels, edges) where labels is
    the final (node, lbl-or-null) vector and edges the cached
    symmetric edge set — reused by graph_modularity so the evaluated
    communities are BY CONSTRUCTION the ones LPA produced.

    r11 (VERDICT #3): the final label vector is memoized exactly like
    ``_graph_base`` — size-1 cache, CacheManager-verified re-persist —
    so graph_label_prop and graph_modularity in one session run the
    3-round propagation ONCE instead of twice (the rounds dominate
    both keys' wall)."""
    edges, deg = _graph_base(spark, sf_dir)
    key = (id(spark.sparkContext), str(sf_dir))
    hit = _LPA_CACHE.get(key)
    if hit is not None:
        try:
            # same trap as _GRAPH_BASE_CACHE: an external clearCache()
            # deregisters the plan while is_cached lies — probe the
            # real CacheManager and re-persist on a stale hit
            cm = spark._jsparkSession.sharedState().cacheManager()
            if cm.lookupCachedData(hit._jdf).isEmpty():
                hit.persist()
            return hit, edges
        except Exception:
            _LPA_CACHE.pop(key, None)
    for old in _LPA_CACHE.values():
        try:
            old.unpersist()
        except Exception:
            pass  # stopped context: blocks already gone
    _LPA_CACHE.clear()
    n = deg.count()  # bounded 1-value collect off the cached degree vector
    nodes = deg.select(F.col("src").alias("node"))
    seed_lbl = F.when(
        F.col("node") % 10 == 0, F.col("node") % 7
    ).cast("long")
    labels = nodes.select("node", seed_lbl.alias("lbl"))
    # The label vector scales with |nodes|, so its broadcast is gated
    # on the MEASURED node count (`_bc_if_small`): fixture scales
    # broadcast, past `_BC_GATE_ROWS` it shuffles to the cached
    # src-hash-partitioned edges (the 100 TB-safe shape; a static
    # hint would pin a driver-OOM-able plan).
    # Deliberately NO per-round materialize or checkpoint: the three
    # rounds form ONE action's DAG.
    # Measured at sf1 solo: plain 21.3 s, +eager
    # cache/count 21.1-22 s, +localCheckpoint 21.2 s — the wall is the
    # per-round join+mode-aggregation work itself (1.7x pagerank's
    # 12.3 s same-box solo, the extra groupBy+join per round), not
    # lineage recompute. At hundreds of rounds a periodic
    # localCheckpoint becomes necessary purely to bound plan size.
    for _ in range(3):
        nb = (
            edges.join(
                _bc_if_small(labels.filter(F.col("lbl").isNotNull()), n),
                edges.src == F.col("node"),
            )
            .groupBy(F.col("dst").alias("nnode"), "lbl")
            .agg(F.count("*").alias("c"))
        )
        best = (
            nb.groupBy("nnode")
            .agg(
                F.max(
                    F.struct(
                        F.col("c").alias("c"),
                        (-F.col("lbl")).alias("neg"),
                    )
                ).alias("m")
            )
            .select("nnode", (-F.col("m")["neg"]).alias("blbl"))
        )
        labels = (
            labels.join(
                _bc_if_small(best, n), labels.node == F.col("nnode"), "left"
            )
            .select(
                "node",
                F.coalesce(
                    seed_lbl, F.col("blbl"), F.col("lbl")
                ).alias("lbl"),
            )
        )
    labels = labels.persist()
    _LPA_CACHE[key] = labels
    return labels, edges


@query(
    "graph_label_prop",
    oracle=f"""
    WITH {_PR_ORACLE_EDGES},
    l0 AS (
      SELECT node,
             CASE WHEN node % 10 = 0 THEN node % 7 END AS lbl
      FROM deg
    ),
    {_lp_round_sql("l0", "l1")},
    {_lp_round_sql("l1", "l2")},
    {_lp_round_sql("l2", "l3")}
    SELECT CAST(lbl AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(node) AS BIGINT) AS min_node,
           CAST(MAX(node) AS BIGINT) AS max_node
    FROM (SELECT node, COALESCE(lbl, -1) AS lbl FROM l3)
    GROUP BY lbl
    """,
)
def graph_label_prop(spark, sf_dir):
    """Synchronous label propagation (3 rounds) over the symmetric
    customer–supplier co-occurrence graph — the standard
    semi-supervised community/attribute spreader (Raghavan et al.,
    2007; the batch form of Spark GraphX's LPA). Every 10th node is
    seeded with a fixed class (``node % 7``); each round, every
    non-seed node adopts the MODE of its neighbors' round-(k-1)
    labels with a deterministic smallest-label tie-break, keeping its
    previous label when no neighbor is labeled yet. Seeds are pinned,
    updates are strictly synchronous (computed only from the previous
    round's vector), and all arithmetic is integer — so the result is
    exactly reproducible and the oracle unrolls the identical three
    rounds in SQL. Output is the per-label census (count + node-range
    fingerprint); -1 counts nodes still unreached after 3 hops.

    Scale shape (the Pregel contract shared with graph_pagerank): the
    edge set is built once, re-hashed on src, and CACHED — it never
    moves again; each round ships only the |nodes|-row label vector
    (broadcast here; at node counts past broadcast size it shuffles
    TO the stationary edges), and the mode-aggregation output shrinks
    to |nodes| rows before the next round. Three bounded rounds keep
    lineage finite without checkpoint management.
    """
    labels, _edges = _lpa_labels(spark, sf_dir)
    final = labels.select(
        "node", F.coalesce("lbl", F.lit(-1)).alias("label")
    )
    return final.groupBy("label").agg(
        F.count("*").alias("n_nodes"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )


@query(
    "dq_constraints",
    oracle="""
    SELECT 'completeness:o_custkey' AS constraint_name,
           CAST(COUNT(o_custkey) AS BIGINT) AS metric_num,
           CAST(COUNT(*) AS BIGINT) AS metric_den,
           CAST(COUNT(o_custkey) = COUNT(*) AS BIGINT) AS passed
    FROM orders
    UNION ALL
    SELECT 'uniqueness:o_orderkey',
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderkey) = COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'range:o_totalprice[0,10000000]',
           CAST(SUM(CASE WHEN o_totalprice >= 0
                          AND o_totalprice <= 10000000
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_totalprice < 0
                          OR o_totalprice > 10000000
                         THEN 1 ELSE 0 END) = 0 AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'membership:o_orderstatus{O,F,P}',
           CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                         THEN 1 ELSE 0 END) = 0 AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'pattern:o_orderpriority ^[1-5]-',
           CAST(SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN NOT regexp_matches(o_orderpriority,
                                                 '^[1-5]-')
                         THEN 1 ELSE 0 END) = 0 AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'referential:l_orderkey->o_orderkey',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                = 0 AS BIGINT)
    """,
)
def dq_constraints(spark, sf_dir):
    """Declarative data-quality constraint suite (the Deequ /
    Great-Expectations operator class): completeness, uniqueness,
    range, set membership, regex pattern, and cross-table referential
    integrity, each reported as (constraint, satisfied count, total,
    passed) with EXACT integer metrics — the validation gate a
    production ingest runs before publishing a snapshot version (and
    the natural audit step on a WAP staging branch before
    `fast_forward` publishes it).

    Scale shape: the five single-table constraints fold into ONE
    aggregate pass over orders — conditional counts are codegen'd
    column expressions, so adding a constraint costs an expression,
    not a scan; uniqueness rides the same pass as a distinct-count.
    The referential check is a LEFT SEMI join count on the key
    (hash-shuffled once, broadcast under AQE when orders' key
    projection is small); no row data ever leaves the aggregate.
    """
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")

    def row(name, num, den, passed):
        return (
            F.lit(name).alias("constraint_name"),
            num.cast("long").alias("metric_num"),
            den.cast("long").alias("metric_den"),
            passed.cast("long").alias("passed"),
        )

    n = F.count("*")
    single = orders.agg(
        F.count("o_custkey").alias("complete"),
        n.alias("total"),
        F.countDistinct("o_orderkey").alias("uniq"),
        F.sum(
            (
                (F.col("o_totalprice") >= 0)
                & (F.col("o_totalprice") <= 10_000_000)
            ).cast("long")
        ).alias("in_range"),
        F.sum(
            F.col("o_orderstatus").isin("O", "F", "P").cast("long")
        ).alias("in_set"),
        F.sum(
            F.col("o_orderpriority").rlike("^[1-5]-").cast("long")
        ).alias("pat_ok"),
    )
    single = materialize(single)

    def srow(name, num_col):
        return single.select(
            *row(
                name,
                F.col(num_col),
                F.col("total"),
                (F.col(num_col) == F.col("total")),
            )
        )

    out = srow("completeness:o_custkey", "complete")
    out = out.unionAll(srow("uniqueness:o_orderkey", "uniq"))
    out = out.unionAll(srow("range:o_totalprice[0,10000000]", "in_range"))
    out = out.unionAll(srow("membership:o_orderstatus{O,F,P}", "in_set"))
    out = out.unionAll(srow("pattern:o_orderpriority ^[1-5]-", "pat_ok"))

    ref = li.join(
        orders.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    ).agg(F.count("*").alias("kept"))
    li_total = li.agg(F.count("*").alias("total"))
    refrow = ref.crossJoin(li_total).select(
        *row(
            "referential:l_orderkey->o_orderkey",
            F.col("kept"),
            F.col("total"),
            (F.col("kept") == F.col("total")),
        )
    )
    return out.unionAll(refrow)


@query(
    "graph_modularity",
    oracle=f"""
    WITH {_PR_ORACLE_EDGES},
    l0 AS (
      SELECT node,
             CASE WHEN node % 10 = 0 THEN node % 7 END AS lbl
      FROM deg
    ),
    {_lp_round_sql("l0", "l1")},
    {_lp_round_sql("l1", "l2")},
    {_lp_round_sql("l2", "l3")},
    comm AS (
      SELECT node, COALESCE(lbl, -(node + 1)) AS comm FROM l3
    ),
    m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM sym),
    degc AS (
      SELECT c.comm, CAST(SUM(d.outdeg) AS BIGINT) AS deg_sum,
             CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM deg d JOIN comm c ON c.node = d.node
      GROUP BY c.comm
    ),
    inc AS (
      SELECT ca.comm, CAST(COUNT(*) AS BIGINT) AS in_edges
      FROM sym s
      JOIN comm ca ON ca.node = s.src
      JOIN comm cb ON cb.node = s.dst AND cb.comm = ca.comm
      GROUP BY ca.comm
    )
    SELECT CAST(d.comm AS BIGINT) AS label, d.n_nodes,
           CAST(COALESCE(i.in_edges, 0) AS BIGINT) AS in_edges,
           d.deg_sum,
           CAST(COALESCE(i.in_edges, 0) * (SELECT m2 FROM m2)
                - d.deg_sum * d.deg_sum AS BIGINT) AS contrib_scaled
    FROM degc d LEFT JOIN inc i ON i.comm = d.comm
    """,
)
def graph_modularity(spark, sf_dir):
    """Newman modularity of the LPA communities — the evaluation half
    the graph family was missing: `graph_label_prop` finds
    communities, this key scores the partition with
    Q = Σ_c [ in_c/2m − (deg_c/2m)² ]. Everything stays EXACT
    integers by scaling through (2m)²: each community's contribution
    is ``in_c·2m − deg_c²`` (in_c counts both directions of an intra-
    community edge, matching Σ A_ij), so the hash can't wobble on
    float division — Q itself is Σ contrib_scaled / (2m)², a number
    the caller derives. Unlabeled nodes score as singleton
    communities (comm = −(node+1), unique), the neutral convention
    that neither rewards nor hides unreached nodes.

    The oracle replays the SAME three LPA rounds through the shared
    `_lp_round_sql` chain — partition and score cannot drift apart —
    then recounts intra-edges and degree sums straight from the edge
    set. The Spark side reuses `_lpa_labels` (one definition of the
    partition for both keys).

    Scale shape: two |E|-bounded joins (edge endpoints → community)
    hashed on node, one |C|-bounded aggregate each; the community
    map's broadcast is gated on the measured node count
    (`_bc_if_small`) — past `_BC_GATE_ROWS` it shuffles to the cached
    edges. At 100 TB deg_c² wants DECIMAL(38)/limb sums past
    deg_c ≈ 3·10⁹ (int64 ceiling) — the documented scale seam, same
    class as ts_autocorr's widened moments.
    """
    labels, edges = _lpa_labels(spark, sf_dir)
    comm = labels.select(
        "node",
        F.coalesce(F.col("lbl"), -(F.col("node") + 1)).alias("comm"),
    )
    _, deg = _graph_base(spark, sf_dir)  # shared persisted degree vector
    n_nodes = deg.count()  # gates the community-map broadcasts below
    m2 = edges.count()  # |sym| = 2m, a bounded 1-value collect
    degc = (
        deg.join(comm, deg.src == comm.node)
        .groupBy("comm")
        .agg(
            F.sum("outdeg").cast("long").alias("deg_sum"),
            F.count("*").alias("n_nodes"),
        )
    )
    ca = comm.select(
        F.col("node").alias("a_node"), F.col("comm").alias("a_comm")
    )
    cb = comm.select(
        F.col("node").alias("b_node"), F.col("comm").alias("b_comm")
    )
    inc = (
        edges.join(_bc_if_small(ca, n_nodes), edges.src == F.col("a_node"))
        .join(
            _bc_if_small(cb, n_nodes),
            (edges.dst == F.col("b_node"))
            & (F.col("b_comm") == F.col("a_comm")),
        )
        .groupBy(F.col("a_comm").alias("comm"))
        .agg(F.count("*").alias("in_edges"))
    )
    return (
        degc.join(inc, "comm", "left")
        .select(
            F.col("comm").cast("long").alias("label"),
            F.col("n_nodes"),
            F.coalesce(F.col("in_edges"), F.lit(0))
            .cast("long")
            .alias("in_edges"),
            F.col("deg_sum"),
            (
                F.coalesce(F.col("in_edges"), F.lit(0)) * F.lit(m2)
                - F.col("deg_sum") * F.col("deg_sum")
            )
            .cast("long")
            .alias("contrib_scaled"),
        )
    )


@query(
    "dq_drift_psi",
    oracle="""
    WITH b AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS side,
             'n_chars' AS feature,
             CAST(LEAST(n_chars // 100, 9) AS VARCHAR) AS bucket
      FROM documents
      UNION ALL
      SELECT CASE WHEN doc_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS side,
             'lang' AS feature, lang AS bucket
      FROM documents
    ),
    c AS (
      SELECT feature, bucket,
             SUM(CASE WHEN side = 'ref' THEN 1 ELSE 0 END) AS n_ref,
             SUM(CASE WHEN side = 'cur' THEN 1 ELSE 0 END) AS n_cur
      FROM b GROUP BY feature, bucket
    ),
    t AS (
      SELECT feature, SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur
      FROM c GROUP BY feature
    )
    SELECT c.feature, c.bucket,
           CAST(c.n_ref AS BIGINT) AS n_ref,
           CAST(c.n_cur AS BIGINT) AS n_cur,
           CASE WHEN c.n_ref > 0 AND c.n_cur > 0 THEN
             ROUND((c.n_ref / t.t_ref - c.n_cur / t.t_cur)
                   * ln((c.n_ref / t.t_ref) / (c.n_cur / t.t_cur)), 8)
           END AS psi_term
    FROM c JOIN t ON t.feature = c.feature
    """,
)
def dq_drift_psi(spark, sf_dir):
    """Population-Stability-Index drift report between two corpus
    slices — the data-quality monitor a training pipeline runs between
    crawl snapshots (the classic PSI credit-scoring formulation:
    Σ (p_ref − p_cur)·ln(p_ref/p_cur); > 0.25 per feature is the
    conventional "population shifted" alarm). Slices are the
    deterministic doc_id-parity halves; features are a numeric
    histogram (n_chars, fixed 100-char bins capped at bin 9 — the cap
    keeps categorical cardinality BOUNDED regardless of corpus tail)
    and a categorical distribution (lang).

    Per-bucket rows carry both counts and the PSI term; buckets
    missing on either side report NULL psi_term (the pinned
    zero-count rule: no epsilon smoothing, the NULL is the signal
    that a class appeared/vanished — callers sum non-NULL terms for
    the headline PSI and treat NULLs as structural drift).

    Scale shape: ONE corpus pass — the union is two projections of
    the same scan, the count aggregation map-side combines into
    ≤ |features|·|buckets| rows, and the per-feature total join runs
    on that tiny aggregate. Drift between two 100 TB snapshots costs
    two scans and a KB-sized join, never a shuffle of the corpus.
    Floats: p's are exact BIGINT ratios and ln() is evaluated on the
    same IEEE expression shape in both engines, with ROUND(8) output.
    """
    d = load(spark, sf_dir, "documents")
    side = F.when(F.col("doc_id") % 2 == 0, F.lit("ref")).otherwise(
        F.lit("cur")
    )
    f1 = d.select(
        side.alias("side"),
        F.lit("n_chars").alias("feature"),
        F.least(F.floor(F.col("n_chars") / 100), F.lit(9))
        .cast("long")
        .cast("string")
        .alias("bucket"),
    )
    f2 = d.select(
        side.alias("side"),
        F.lit("lang").alias("feature"),
        F.col("lang").alias("bucket"),
    )
    c = (
        f1.unionAll(f2)
        .groupBy("feature", "bucket")
        .agg(
            F.sum(F.when(F.col("side") == "ref", 1).otherwise(0)).alias(
                "n_ref"
            ),
            F.sum(F.when(F.col("side") == "cur", 1).otherwise(0)).alias(
                "n_cur"
            ),
        )
    )
    w = Window.partitionBy("feature")
    p_ref = F.col("n_ref") / F.sum("n_ref").over(w)
    p_cur = F.col("n_cur") / F.sum("n_cur").over(w)
    return c.select(
        "feature",
        "bucket",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.when(
            (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
            F.round((p_ref - p_cur) * F.log(p_ref / p_cur), 8),
        ).alias("psi_term"),
    )
