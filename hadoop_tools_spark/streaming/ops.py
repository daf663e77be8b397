"""Streaming operators (SURVEY.md §2.D), declared in batch form.

Structured Streaming guarantees that a windowed/stateful plan over a
finite stream equals the same plan run as a batch — so each key here
is the *batch-equivalent* DataFrame (hash-matchable against DuckDB),
and tests/test_streaming.py executes the identical logical plans as
real file-source micro-batch streams (`trigger(availableNow=True)`,
watermarks, state stores) asserting stream-result == batch-result.

Scale notes: windowed aggregation state is keyed by (window, keys) in
the state store; the watermark bounds state size — without it an
unbounded-key stream OOMs the store. Session windows additionally
merge adjacent state entries. All keys below use event-time columns,
never processing time, so replays are deterministic.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "stream_tumbling",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def stream_tumbling(spark, sf_dir):
    """Tumbling 1-hour event-time windows per event type."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_sliding",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '15 minutes', ts)
                - k * INTERVAL '15 minutes' AS TIMESTAMP) AS window_start,
           COUNT(*) AS n_events
    FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) ks
    GROUP BY window_start
    """,
)
def stream_sliding(spark, sf_dir):
    """Sliding 1-hour windows every 15 minutes (each event lands in 4
    windows — Spark's window() expands exactly the offsets the oracle
    generates)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


@query(
    "stream_session",
    oracle="""
    WITH o AS (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev
        FROM events
    ),
    f AS (
        SELECT user_id, ts,
               CASE WHEN prev IS NULL OR ts - prev > INTERVAL '10 minutes'
                    THEN 1 ELSE 0 END AS new_s,
               event_id
        FROM o
    ),
    s AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM f
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL '10 minutes' AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session(spark, sf_dir):
    """Gap-based session windows (10-minute inactivity gap) per user.

    `F.session_window` end = last event + gap; the oracle's classic
    lag/flag/running-sum islands formulation states identical
    semantics relationally.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "stream_dedup",
    oracle="""
    WITH r AS (
        SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT event_id, user_id, event_type, ts FROM r WHERE rn = 1
    """,
)
def stream_dedup(spark, sf_dir):
    """First occurrence per (user, event_type) in event-time order —
    the deterministic batch statement of streaming dropDuplicates
    over an ordered source (the streaming run itself is asserted
    equal in tests/test_streaming.py)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )


@query(
    "stream_state_running",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value,
           CAST(MAX(ts) AS TIMESTAMP) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def stream_state_running(spark, sf_dir):
    """Final per-user state of a running aggregate — the batch answer
    that the arbitrary-stateful streaming op (applyInPandasWithState,
    streaming/stateful.py) must converge to after the last
    micro-batch."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "stream_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment, e.event_type
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def stream_enrich(spark, sf_dir):
    """Stream–static join: events enriched with a static dimension.

    No state is kept — the cheapest streaming join shape. customer
    scales with SF, so it carries no static broadcast hint: AQE (or
    the per-batch planner in the streaming run) broadcasts it when it
    actually fits and shuffles otherwise.
    """
    ev = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    return ev.join(
        c, ev.user_id == c.c_custkey
    ).select("event_id", "user_id", "c_mktsegment", "event_type")


@query(
    "stream_stream_join",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS view_id,
           a.user_id,
           CAST(a.ts AS TIMESTAMP) AS click_ts,
           CAST(b.ts AS TIMESTAMP) AS view_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'view'
     AND b.ts >= a.ts - INTERVAL 10 MINUTE
     AND b.ts <= a.ts
    """,
)
def stream_stream_join(spark, sf_dir):
    """Stream-stream join batch form: each click joined to the same
    user's views in the preceding 10 minutes.

    As a live stream-stream join both sides buffer rows in the state
    store; the equi key (user_id) partitions state, and the time-range
    condition + watermarks bound how long each side is retained —
    without the range bound the state grows forever. The batch form
    is the same logical join; tests/test_streaming.py runs the
    streaming execution with watermarks on both sides and asserts it
    produces exactly these rows.
    """
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
    )
    return (
        clicks.join(
            views,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("view_ts") <= F.col("click_ts")),
        )
        .select("click_id", "view_id", "user_id", "click_ts", "view_ts")
    )


@query(
    "stream_outer_join",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS view_id,
           a.user_id,
           CAST(a.ts AS TIMESTAMP) AS click_ts,
           CAST(b.ts AS TIMESTAMP) AS view_ts
    FROM events a LEFT JOIN events b
      ON a.user_id = b.user_id
     AND b.event_type = 'view'
     AND b.ts >= a.ts - INTERVAL 10 MINUTE
     AND b.ts <= a.ts
    WHERE a.event_type = 'click'
    """,
)
def stream_outer_join(spark, sf_dir):
    """LEFT-OUTER stream-stream join batch form: every click, matched
    to same-user views in the preceding 10 minutes, or NULLs if none.

    The outer side is the operationally interesting one in streaming:
    a null row can only be emitted once the watermark proves no
    matching view can still arrive, so emission is watermark-gated
    and state eviction doubles as the null trigger.
    tests/test_streaming.py runs the live version with watermarks on
    both sides plus a stream-end flush event that advances the final
    watermark past every pending click — proving the streamed rows
    (matches AND nulls) equal this batch plan exactly.
    """
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
    )
    return (
        clicks.join(
            views,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("view_ts") <= F.col("click_ts")),
            "left",
        )
        .select("click_id", "view_id", "user_id", "click_ts", "view_ts")
    )


@query(
    "stream_hier_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_hour,
           CAST(time_bucket(INTERVAL '15 minutes', ts) AS TIMESTAMP)
               AS bucket_15m,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY ROLLUP (bucket_day, bucket_hour, bucket_15m)
    """,
)
def stream_hier_rollup(spark, sf_dir):
    """Hypertable-style hierarchical time rollup: day ⊃ hour ⊃ 15-min
    totals in ONE pass (a single Expand + partial-aggregated shuffle,
    not three scans).

    This is the batch form of a continuous-aggregate hierarchy: a
    time-series store maintains the 15-min rollup incrementally (the
    tumbling-window streaming key) and derives coarser levels from
    finer ones; here the whole lattice is produced by ROLLUP over the
    derived bucket columns. NULL rows are the subtotal levels. The
    shuffle carries one partial state per (bucket lattice point ×
    partition) — at 100 TB the Expand factor (4 rows per event) is
    traded against never rescanning the fact.
    """
    ev = load(spark, sf_dir, "events")
    q = (F.floor(F.unix_timestamp("ts") / 900) * 900).cast("timestamp")
    return (
        ev.withColumn("bucket_day", F.date_trunc("day", "ts"))
        .withColumn("bucket_hour", F.date_trunc("hour", "ts"))
        .withColumn("bucket_15m", q)
        .rollup("bucket_day", "bucket_hour", "bucket_15m")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@query(
    "stream_topk",
    oracle="""
    WITH agg AS (
      SELECT CAST(time_bucket(INTERVAL '6 hours', ts) AS TIMESTAMP)
               AS window_start,
             user_id,
             ROUND(SUM(value), 4) AS sum_value
      FROM events GROUP BY window_start, user_id
    )
    SELECT window_start, user_id, sum_value,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                                   ORDER BY sum_value DESC, user_id) AS rnk
      FROM agg
    )
    WHERE rnk <= 3
    """,
)
def stream_topk(spark, sf_dir):
    """Windowed top-k: the 3 highest-value users per 6-hour window.

    Batch form of the streaming leaderboard: windowed per-user
    aggregation, then a per-window rank keeping k rows. In the live
    stream the rank runs where the window is complete — inside
    foreachBatch on watermark-closed windows (the aggregation state is
    the only distributed state; ranking k-of-closed-window is a
    per-window sort of already-reduced rows). Window count bounds the
    rank partitions; user cardinality only affects the upstream agg,
    which partial-aggregates map-side.
    """
    ev = load(spark, sf_dir, "events")
    agg = (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "user_id")
        .agg(F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "user_id", "sum_value")
    )
    w = Window.partitionBy("window_start").orderBy(
        F.col("sum_value").desc(), F.col("user_id")
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )
